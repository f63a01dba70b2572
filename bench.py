"""Benchmark: overnight recordings/hour/chip, EDF -> hypnogram.

Measures the full inference pipeline on the flagship wav2sleep model
(4 cardio-respiratory modalities, feature_dim 128) using the quantized-grid
streaming path (default q8): the host fuses EDF decode + resample onto the
model grid in the digital domain (C++ kernel) and ships mu-law int8 codes;
the device expands, applies the digital->physical affine, z-scores and runs
the batched bf16 forward in one jitted graph. Source EDFs default to
NSRR-realistic OFF-GRID rates (ECG 125 Hz / PPG 256 Hz / resp 10 Hz) so the
real lerp path is what gets timed (--source-rates grid for the identity
fast path). q8 quality is measured end-to-end by scripts/q8_quality.py
on the realistic-morphology corpus (QRS-wavelet ECG etc.,
wav2sleep_tpu/data/synth.py): 99.9% hypnogram agreement / kappa 0.998 vs
the lossless f32 path and a -0.02% end-task accuracy delta, flips confined
to near-tie decision margins. Lossless transports are selectable
(--pipeline q16/raw/f32) and remain the default for the library's
predict_on_folder API path.

Prints ONE JSON line: metric/value/unit/vs_baseline plus the pipeline,
source-rate regime, precision and every pass time (value = median pass).
Baseline: 5,000 recordings/hour on a v5e-8 => 625 recordings/hour/chip
(BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np

BASELINE_PER_CHIP = 5000.0 / 8.0  # recordings/hour/chip


# Source sampling rates (Hz). 'grid' writes files already at the model grid
# (1024/30 and 256/30 Hz), which lets the q16/q8 kernels take their ratio==1
# identity fast path; 'offgrid' writes NSRR-realistic rates (SHHS ECG 125 Hz,
# MESA PPG 256 Hz, SHHS ABD/THX 10 Hz; MESA EOG 256 Hz) so the true lerp
# path — and, for the raw pipeline, real bucket geometry — is what gets
# timed. Keyed by the released-variant signal set (--signals).
SOURCE_RATES = {
    'cardio': {
        'grid': {'ECG': 1024 / 30, 'Pleth': 1024 / 30, 'ABDO RES': 256 / 30, 'THOR RES': 256 / 30},
        'offgrid': None,  # wav2sleep_tpu.data.synth.RATES (NSRR-realistic)
    },
    'eog': {
        'grid': {'EOG(L)': 4096 / 30, 'EOG(R)': 4096 / 30},
        'offgrid': None,  # wav2sleep_tpu.data.synth.RATES_EOG
    },
}
SIGNAL_SETS = {
    'cardio': ['ABD', 'THX', 'ECG', 'PPG'],
    'eog': ['EOG-L', 'EOG-R'],
}


def generate_edfs(
    folder: str,
    n_nights: int,
    hours: float,
    seed: int = 0,
    source_rates: str = 'offgrid',
    signal_set: str = 'cardio',
) -> list[str]:
    """Distinct realistic-morphology overnight EDFs (QRS-wavelet ECG,
    pulsatile PPG, breathing-shaped respiration; or stage-modulated EOG
    pairs — wav2sleep_tpu/data/synth.py) at grid or NSRR-realistic rates."""
    from wav2sleep_tpu.data.synth import write_nights

    fps, _ = write_nights(
        folder, n_nights, hours, seed,
        rates=SOURCE_RATES[signal_set][source_rates], kind=signal_set,
    )
    return fps


def calibrate_link(n_bytes: int = 32 << 20, reps: int = 4) -> dict:
    """Same-session device-link calibration: one fixed-size H2D and D2H
    transfer, repeated, median MB/s each way. The tunnel-attached link has
    hours-scale weather (VERDICT r3: driver captures halved across rounds
    with no code change), so every bench JSON carries this field — it lets
    a reader separate code regression from a slow link day. Protocol: the
    host buffer is allocated+touched once and reused (fresh allocations
    page-fault at ~12 MB/s on this VM — that tax is the host's, not the
    link's); rep 1 of each direction is discarded as warm-up."""
    import jax
    import jax.numpy as jnp

    buf = np.empty(n_bytes, np.uint8)
    buf[:] = 42  # touch every page before timing
    h2d, d2h = [], []
    dev = None
    for i in range(reps + 1):
        t0 = time.time()
        dev = jax.device_put(buf)
        jax.block_until_ready(dev)
        if i:
            h2d.append(time.time() - t0)
    # D2H must fetch a DEVICE-PRODUCED array: device_get of the device_put
    # result above returns the runtime's cached host-side copy without
    # touching the link (measured 3.7 TB/s — i.e. a memcpy, not a transfer).
    # A trivial jitted op forces a fresh on-device value each rep. The fetch
    # allocates a new host array per rep; after rep 1 the allocator recycles
    # the just-freed (already-touched) block, so only the discarded warm-up
    # rep pays this VM's page-fault tax.
    bump = jax.jit(lambda x: x + jnp.uint8(1))
    for i in range(reps + 1):
        fresh = bump(dev)
        jax.block_until_ready(fresh)
        t0 = time.time()
        out = jax.device_get(fresh)
        if i:
            d2h.append(time.time() - t0)
        del out, fresh
    del dev
    mb = n_bytes / (1 << 20)
    return {
        'link_h2d_MBps': round(mb / float(np.median(h2d)), 1),
        'link_d2h_MBps': round(mb / float(np.median(d2h)), 1),
        'link_probe_MiB': int(mb),
    }


def _warm_extractor_pipeline(pipe, fps, work, batch: int) -> None:
    """Steady-state warm-up (untimed), shared by the extractor-based
    pipelines (raw/q16/q8): page-warm every pooled buffer slot and the OS
    page cache for each distinct file, then run one real batch — this VM
    faults fresh mappings at ~12 MB/s, a cold-start cost, not pipeline
    throughput."""
    for raw, meta in pipe._bufs:
        for i, fp in enumerate(fps[:batch]):
            pipe.extractor.extract_into(fp, raw, meta, i % batch)
    for _ in pipe.run(work[:batch]):
        pass


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--nights', type=int, default=32)
    parser.add_argument('--batch', type=int, default=8)
    parser.add_argument('--hours', type=float, default=10.0)
    parser.add_argument('--precision', default='bfloat16', choices=['float32', 'bfloat16'])
    parser.add_argument('--feature-dim', type=int, default=128)
    parser.add_argument(
        '--pipeline',
        default='q8',
        choices=['q8', 'q16', 'q4', 'raw', 'f32'],
        help=(
            'q16: host fused resample to grid-aligned int16, device affine+model '
            '(no gather); q8: same but mu-law int8 transport (half the bytes, '
            '~bf16-grade precision); q4: packed 4-bit block-DPCM residual codes '
            '(~52% of the q8 bytes; quality measured by scripts/q8_quality.py); '
            'raw: ship raw int16 + '
            'resample on device; f32: host decode/resample to float32'
        ),
    )
    parser.add_argument(
        '--signals',
        default='cardio',
        choices=sorted(SIGNAL_SETS),
        help=(
            'released-variant signal set: cardio = wav2sleep (ECG+PPG+ABD+THX, '
            '4-class); eog = wav2sleep-eog (EOG-L/R, 5-class, 4096 samples/'
            'epoch -> the deepest 10-block encoders)'
        ),
    )
    parser.add_argument(
        '--no-link-calibration',
        action='store_true',
        help='skip the same-session H2D/D2H link probe (link_MBps JSON fields)',
    )
    parser.add_argument(
        '--source-rates',
        default='offgrid',
        choices=('grid', 'offgrid'),
        help=(
            'offgrid (default): NSRR-realistic source rates exercising the real '
            'lerp/resample path; grid: sources already at the model grid '
            '(identity fast path)'
        ),
    )
    parser.add_argument('--passes', type=int, default=3, help='measured passes; median is reported')
    parser.add_argument('--verbose', action='store_true')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir', os.path.join(os.path.dirname(__file__), '.cache', 'jax'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from __graft_entry__ import _flagship_model
    from wav2sleep_tpu.pipeline import (
        StreamingPipeline,
        StreamingPipelineQ4,
        StreamingPipelineQ8,
        StreamingPipelineQ16,
        StreamingPipelineRaw,
    )
    from wav2sleep_tpu.settings import COLS_TO_SAMPLES_PER_EPOCH

    signals = SIGNAL_SETS[args.signals]
    model, _cfg = _flagship_model(feature_dim=args.feature_dim, variant=args.signals)

    # --- generate corpus (not timed) ---
    # Every night is a DISTINCT file: steady-state serving never re-reads
    # the same EDF, so the timed passes cover --nights distinct decodes
    # (pass 1 is the coldest-ish figure — pooled buffers warm, file bytes
    # from the page cache; later passes re-read warm files). The corpus is
    # cached on disk across runs (generation is ~7 s/night on this host).
    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        '.cache',
        'bench_corpus',
        f'{args.signals}_{args.source_rates}_{args.nights}x{args.hours:g}h'
        if args.signals != 'cardio'
        else f'{args.source_rates}_{args.nights}x{args.hours:g}h',
    )
    # Stamp the cache with a hash of everything that determines the on-disk
    # corpus bytes — the waveform generator, the EDF writer (int16
    # quantization ranges, record layout), AND this script's own generation
    # config (the active SOURCE_RATES table and seed; the cache dir name
    # only encodes the table's NAME) — so editing any of them regenerates
    # the corpus instead of silently benchmarking stale waveforms under the
    # new configuration's name.
    import hashlib

    from wav2sleep_tpu.data import edf as _edf_mod, synth as _synth_mod

    h = hashlib.sha256()
    for mod in (_synth_mod, _edf_mod):
        with open(mod.__file__, 'rb') as f:
            h.update(f.read())
    h.update(f'{SOURCE_RATES[args.signals][args.source_rates]!r}|kind={args.signals}|seed=0'.encode())
    gen_stamp = h.hexdigest()
    stamp_fp = os.path.join(cache, 'GENERATOR_STAMP')
    try:
        with open(stamp_fp) as f:
            stamp_ok = f.read().strip() == gen_stamp
    except OSError:
        stamp_ok = False
    fps = sorted(
        os.path.join(cache, f) for f in (os.listdir(cache) if os.path.isdir(cache) else [])
        if f.endswith('.edf')
    )
    if len(fps) != args.nights or not stamp_ok:
        tmp = tempfile.mkdtemp(prefix='w2s_bench_')
        fps = generate_edfs(
            tmp, args.nights, args.hours,
            source_rates=args.source_rates, signal_set=args.signals,
        )
        try:
            import shutil

            if os.path.isdir(cache):
                shutil.rmtree(cache)  # stale generator output
            os.makedirs(cache, exist_ok=True)
            for fp in fps:
                shutil.copy(fp, cache)
            with open(stamp_fp, 'w') as f:
                f.write(gen_stamp + '\n')
        except OSError:
            pass  # cache is best-effort; benchmark proceeds from tmp
        else:
            fps = [os.path.join(cache, os.path.basename(fp)) for fp in fps]
            shutil.rmtree(tmp, ignore_errors=True)  # ~GBs per regeneration
    else:
        # Re-touch cached files so pass 1 reads from the page cache rather
        # than faulting cold storage (documented warm protocol).
        for fp in fps:
            with open(fp, 'rb') as f:
                while f.read(1 << 22):
                    pass
    work = list(fps)

    # --- params: abstract init + random materialization (not timed) ---
    dtype = jnp.bfloat16 if args.precision == 'bfloat16' else jnp.float32
    tiny = {k: np.zeros((1, COLS_TO_SAMPLES_PER_EPOCH[k] * 2), np.float32) for k in signals}
    var_shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), tiny))
    rng = np.random.default_rng(0)
    variables = jax.tree_util.tree_map(
        lambda sh: jnp.asarray(rng.normal(size=sh.shape, scale=0.05), dtype), var_shapes
    )

    if args.pipeline in ('q16', 'q8', 'q4'):
        cls = {
            'q16': StreamingPipelineQ16,
            'q8': StreamingPipelineQ8,
            'q4': StreamingPipelineQ4,
        }[args.pipeline]
        pipe = cls(
            model,
            variables,
            signals,
            batch_size=args.batch,
            max_length_hours=args.hours,
            precision=args.precision,
        )
        t0 = time.time()
        pipe.warmup()  # compile (not timed)
        compile_s = time.time() - t0
        _warm_extractor_pipeline(pipe, fps, work, args.batch)
    elif args.pipeline == 'raw':
        pipe = StreamingPipelineRaw(
            model,
            variables,
            signals,
            batch_size=args.batch,
            max_length_hours=args.hours,
            precision=args.precision,
        )
        t0 = time.time()
        pipe.warmup(fps[0])  # compile (not timed)
        compile_s = time.time() - t0
        _warm_extractor_pipeline(pipe, fps, work, args.batch)
    else:
        pipe = StreamingPipeline(
            model,
            variables,
            signals,
            batch_size=args.batch,
            max_length_hours=args.hours,
            precision=args.precision,
        )
        t0 = time.time()
        pipe.warmup()  # compile + first-touch the pooled buffers (not timed)
        compile_s = time.time() - t0
        for buf in pipe._bufs:
            for i, fp in enumerate(fps[: args.batch]):
                pipe.decoder.decode_into(fp, {c: buf[c][i % args.batch] for c in signals})
        import jax.numpy as jnp

        dev = {c: jnp.asarray(pipe._bufs[0][c]) for c in signals}
        np.asarray(pipe.forward(variables, dev))

    # Same-session link calibration (before the timed passes, same process):
    # cross-day throughput comparisons can separate code from link weather.
    link = {} if args.no_link_calibration else calibrate_link()

    # Several measured passes; report the median (the device link is shared
    # infrastructure with large temporal jitter — median resists both a slow
    # outlier pass and the upward bias a best-of estimator would introduce).
    # All pass times ship in the JSON line so consumers can pick otherwise.
    elapsed = []
    hypnograms = {}
    for _ in range(max(1, args.passes)):
        start = time.time()
        for fp, hyp in pipe.run(work):
            hypnograms[fp] = hyp
        elapsed.append(time.time() - start)
    processed = len(work)
    median = float(np.median(elapsed))
    per_hour_per_chip = processed / median * 3600.0

    # Exactly ONE JSON line (driver/CLAUDE.md contract) — the verbose
    # extras ride as additional keys on the same line.
    sig_desc = {'cardio': 'ECG+PPG+ABD+THX', 'eog': 'EOG-L+EOG-R'}[args.signals]
    line = {
        'metric': f'EDF->hypnogram inference throughput ({args.hours:g}h nights, {sig_desc})',
        'value': round(per_hour_per_chip, 1),
        'unit': 'recordings/hour/chip',
        'vs_baseline': round(per_hour_per_chip / BASELINE_PER_CHIP, 3),
        'pipeline': args.pipeline,
        'source_rates': args.source_rates,
        'precision': args.precision,
        # Structured copies of the metric-string facts so consumers
        # (scripts/readme_bench.py) never have to parse or assume them.
        'hours': args.hours,
        'signals': args.signals,
        'modalities': sig_desc,
        'passes_s': [round(e, 3) for e in elapsed],
        **link,
    }
    if args.verbose:
        line.update(
            processed=processed,
            compile_s=round(compile_s, 2),
            sec_per_night=round(median / processed, 3),
        )
    print(json.dumps(line))


if __name__ == '__main__':
    main()
