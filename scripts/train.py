#!/usr/bin/env python
"""Training entry point.

Equivalent of the reference's hydra-driven ``scripts/train.py`` with the
same override style::

    python scripts/train.py name=joint datasets=all inputs=cardiorespiratory/all
    python scripts/train.py name=mesa_ecg datasets=mesa inputs=cardiorespiratory/ecg epochs=10
    python scripts/train.py name=eog datasets=eog inputs=neural/eog num_classes=5

Replaces Lightning DDP with a jitted data-parallel train step over the TPU
mesh; gradient accumulation arithmetic mirrors the reference
(target_batch_size / (batch_size * n_devices), scripts/train.py:59-76 there).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

logger = logging.getLogger('train')


def warn_if_dirty_git(repo_root: str = REPO_ROOT, debug: bool = False) -> bool:
    """Warn when training from a dirty git tree. The reference's hydra git
    callback refuses to launch outside debug mode (hydra/callbacks/git.yaml);
    we warn instead of aborting so queued TPU time isn't wasted, but the run
    is flagged as not reproducible from a commit. Returns True if dirty."""
    import subprocess

    if debug:
        return False
    try:
        out = subprocess.run(
            ['git', 'status', '--porcelain'],
            cwd=repo_root,
            capture_output=True,
            text=True,
            timeout=10,
        )
        dirty = out.returncode == 0 and bool(out.stdout.strip())
    except Exception:
        return False
    if dirty:
        logger.warning(
            'Git tree is dirty — this run cannot be reproduced from a commit '
            '(the reference refuses to launch in this state outside debug).'
        )
    return dirty


def main(argv: list[str] | None = None) -> dict:
    argv = sys.argv[1:] if argv is None else argv
    t_start = time.time()
    logging.basicConfig(level=logging.INFO, format='%(asctime)s %(name)s %(levelname)s %(message)s')
    logging.getLogger('absl').setLevel(logging.WARNING)  # quiet orbax internals

    from wav2sleep_tpu.config import compose
    from wav2sleep_tpu.utils import fix_seeds

    cfg = compose(os.path.join(REPO_ROOT, 'scripts', 'config'), 'main', argv)

    from wav2sleep_tpu.parallel.mesh import maybe_initialize_distributed

    # MUST precede any JAX computation (fix_seeds creates a PRNGKey, which
    # initializes the local-only backend and would make a multi-host
    # initialize permanently fail — see parallel/mesh.py).
    maybe_initialize_distributed()
    fix_seeds(cfg['seed'])
    warn_if_dirty_git(debug=bool(cfg.get('debug', {}).get('max_nights')))

    import jax

    from wav2sleep_tpu.checkpoint import reference_compatible_config
    from wav2sleep_tpu.instantiate import instantiate, model_family
    from wav2sleep_tpu.parallel.mesh import make_mesh
    from wav2sleep_tpu.train.datamodule import SleepDataModule
    from wav2sleep_tpu.train.loop import Trainer

    model_cfg = cfg['model']
    model = instantiate(model_cfg)
    family = model_family(model_cfg)
    masker_cfg = cfg.get('inputs', {}).get('masker')
    masker = instantiate(masker_cfg) if masker_cfg else None

    devices = jax.devices()
    n_dev = cfg['num_devices'] or len(devices)
    mesh = make_mesh(devices[:n_dev], data=n_dev, model=1) if n_dev > 1 else None

    batch_size = cfg['batch_size']
    if cfg.get('tune_batch_size') and n_dev == 1:  # single-device only, like the reference
        from wav2sleep_tpu.train.tuning import tune_batch_size

        tuned = tune_batch_size(
            model,
            columns=list(cfg['inputs']['signal_map'].keys()),
            num_classes=cfg['num_classes'],
            epochs_per_night=cfg.get('pad_to_epochs') or int(round(cfg['max_length_hours'] * 120)),
            family=family,
            # Probe with the param-sized state the real step will carry:
            # in-graph EMA tree, or — when the EMA is offloaded — the
            # deferred-fold snapshot ring it pins on device instead
            # (max(2, stage_ring) queued trees + the in-flight one), and
            # the MultiSteps acc_grads tree (accumulation is decided from
            # the tuned size, so probe conservatively with it present).
            ema=cfg['training']['ema']['enabled'] and not cfg['training']['ema'].get('offload', False),
            ema_pending_trees=(
                max(2, getattr(Trainer, 'stage_ring', 4)) + 1
                if cfg['training']['ema']['enabled'] and cfg['training']['ema'].get('offload', False)
                else 0
            ),
            grad_accum=True,
        )
        if tuned:
            logger.info(f'Tuned batch size: {tuned}')
            batch_size = tuned
    accumulate = max(cfg['target_batch_size'] // (batch_size * max(n_dev, 1)), 1)
    if accumulate > 1:
        logger.info(f'Gradient accumulation: {accumulate} steps (effective batch {batch_size * n_dev * accumulate}).')

    tcfg = cfg['training']
    dm = SleepDataModule(
        columns=list(cfg['inputs']['signal_map'].keys()),
        data_location=cfg['data_location'],
        train_datasets=cfg['datasets']['train'],
        val_datasets=cfg['datasets']['val'],
        test_datasets=cfg['datasets']['test'],
        num_classes=cfg['num_classes'],
        max_nights=cfg.get('debug', {}).get('max_nights', 1_000_000),
        test=cfg['test'],
        batch_size=batch_size,
        val_batch_size=tcfg['val_batch_size'],
        test_batch_size=tcfg['test_batch_size'],
        num_workers=cfg['num_cpus'],
        drop_last=tcfg['drop_last'],
        causal=cfg['causal'],
        seed=cfg['seed'],
        max_length_hours=cfg['max_length_hours'],
        pad_to_epochs=cfg.get('pad_to_epochs'),
    )

    log_dir = cfg.get('run_dir') or os.path.join(
        cfg['log_root'], 'logs', cfg['name'], time.strftime('%Y-%m-%d/%H-%M-%S')
    )
    trainer = Trainer(
        model=model,
        datamodule=dm,
        num_classes=cfg['num_classes'],
        family=family,
        lr=float(tcfg['optimizer']['lr']),
        weight_decay=float(tcfg['optimizer']['weight_decay']),
        warmup_steps=int(tcfg['scheduler'].get('warmup_steps', 0) or 0),
        tau=float(tcfg['scheduler'].get('tau', 10_000) or 10_000),
        scheduler={'expdecay': 'expdecay', 'plateau': 'plateau'}.get(tcfg['scheduler'].get('name'), 'none'),
        grad_clip=tcfg['grad_clip'],
        accumulate_grad_batches=accumulate,
        epochs=cfg['epochs'],
        label_smoothing=tcfg['label_smoothing'],
        masker=masker,
        flip_polarity=tcfg['flip_polarity'],
        ema_decay=tcfg['ema']['decay'] if tcfg['ema']['enabled'] else None,
        ema_start_step=tcfg['ema']['start_step'],
        ema_offload=tcfg['ema'].get('offload', False),
        early_stopping_patience=tcfg['early_stopping_patience'],
        reset_early_stopping=tcfg['reset_early_stopping'],
        precision=cfg['precision'],
        input_transport=cfg.get('input_transport'),
        eval_transport=cfg.get('eval_transport'),
        shadow_eval_transport=cfg.get('shadow_eval_transport'),
        # Transfer-pipeline depth (training/main.yaml): bounds in-flight H2D
        # bytes on relay-attached TPUs with large batches.
        metric_fetch_every=int(tcfg.get('metric_fetch_every', 16)),
        eval_fetch_every=int(tcfg.get('eval_fetch_every', 16)),
        stage_ring=int(tcfg.get('stage_ring', 4)),
        seed=cfg['seed'],
        log_dir=log_dir,
        mesh=mesh,
    )
    if cfg.get('profile'):
        _with_profile(trainer, log_dir)

    logger.info(f'Training {cfg["name"]} for {cfg["epochs"]} epochs; logs at {log_dir}')
    final = trainer.fit(resume_from=cfg.get('ckpt_path'))

    if cfg['restore_best']:
        best = os.path.join(log_dir, 'checkpoints', 'best')
        if os.path.isdir(best):
            trainer.restore(best)
            logger.info('Restored best (lowest val_loss) checkpoint.')
    if cfg['test']:
        final = trainer.evaluate('test')

    # Export the deployable checkpoint folder (reference log.py:63-83 format,
    # with _target_ names both implementations can instantiate).
    export_dir = os.path.join(log_dir, 'model')
    trainer.export(export_dir, reference_compatible_config(model_cfg))
    logger.info(f'Exported deployable checkpoint to {export_dir}')
    # Job wall time (the reference's hydra TimerCallback role, SURVEY.md §5.1).
    logger.info(f'Job wall time: {time.time() - t_start:.1f}s')
    # Persist the final metric dict: a supervised run (train/supervise.py)
    # launches main() in a subprocess and cannot see the return value.
    with open(os.path.join(log_dir, 'final_metrics.json'), 'w') as f:
        json.dump({k: float(v) for k, v in final.items()}, f, indent=2)
    return final


def _with_profile(trainer, log_dir: str) -> None:
    """Wrap the first training epoch in a jax.profiler trace (the reference's
    opt-in PyTorchProfiler role, SURVEY.md §5.1)."""
    import jax

    orig = trainer.train_epoch

    def traced(epoch):
        if epoch == 0:
            with jax.profiler.trace(os.path.join(log_dir, 'profile')):
                return orig(epoch)
        return orig(epoch)

    trainer.train_epoch = traced


def expand_multirun(argv: list[str]) -> list[list[str]] | None:
    """Hydra-style ``-m``/``--multirun`` sweep expansion.

    ``train.py -m datasets=mesa,shhs lr=1e-3,3e-4`` runs the Cartesian
    product of every comma-separated override (4 runs here), like the
    reference's hydra-submitit sweeps (SURVEY.md §5.6) but sequential on the
    local TPU. Returns None when not in multirun mode. Each variant gets a
    ``name`` suffix recording its swept values so logs/checkpoints don't
    collide.
    """
    if '-m' not in argv and '--multirun' not in argv:
        return None
    base = [a for a in argv if a not in ('-m', '--multirun')]
    variants: list[tuple[list[str], list[str]]] = [([], [])]  # (overrides, name parts)
    for arg in base:
        value = arg.split('=', 1)[1] if '=' in arg else ''
        # Bracketed values are YAML lists for a single run, not sweep axes.
        if ',' in value and '[' not in value and not arg.startswith('name='):
            key, values = arg.split('=', 1)
            variants = [
                (ov + [f'{key}={v}'], parts + [f'{key.rsplit(".", 1)[-1]}-{v.replace("/", ".")}'])
                for ov, parts in variants
                for v in values.split(',')
            ]
        else:
            variants = [(ov + [arg], parts) for ov, parts in variants]
    out = []
    for ov, parts in variants:
        name = next((a.split('=', 1)[1] for a in ov if a.startswith('name=')), 'sweep')
        suffix = '_'.join(parts)
        out.append(ov + ([f'name={name}_{suffix}'] if suffix else []))
    return out


def run(argv: list[str] | None = None):
    argv = sys.argv[1:] if argv is None else argv
    sweeps = expand_multirun(argv)
    if sweeps is None:
        return main(argv)
    results = {}
    for i, sub in enumerate(sweeps):
        logger.info(f'--- multirun {i + 1}/{len(sweeps)}: {sub}')
        results[i] = main(sub)
    return results


if __name__ == '__main__':
    run()
