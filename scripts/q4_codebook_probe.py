#!/usr/bin/env python
"""End-task A/B of candidate 4-bit transport codebooks, host-simulated.

The ORIGINAL q4 transport (global-peak mu-law, 3 magnitude bits; retired
round 4) measured a real quality tax (~-2.3% accuracy, kappa(q4,f32)
~0.967 on the q8_quality.py protocol) because a spiky channel's global
peak squeezes the inter-beat baseline into the bottom mu-law levels; this
probe is what selected its replacement — the block-DPCM codebook that
ships today (pipeline.Q4NightExtractor). It reuses the
EXACT q8_quality protocol (same corpus seeds, same trained weights, same
lossless-f32 reference logits) and evaluates alternative 4-bit
reconstruction schemes by quantize/dequantizing the decoded f32 grid on
the host and running the reference f32 forward over the reconstruction:

- global-mulaw     the RETIRED round-3 q4 codebook (methodology anchor:
                   its row reproduces that codec's measured acc_delta)
- block-linear-K   per-K-sample-block peak scale, 15 uniform levels
- dpcm-K           closed-loop first-order DPCM: 15-level quantization of
                   the prediction residual, block scale = the block's
                   diff peak (decode = cumsum of code*scale, a log-depth
                   associative scan on TPU)

Scale overhead is reported as extra bytes/sample assuming one uint8
log-scale per block (the transportable form; this probe uses exact f32
scales, which the z-RMS proxy puts within ~4% of the exp8-rounded form).
Prints one JSON line per scheme. Run on the TPU (one training ~5 min).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from q8_quality import build_parser, compare, setup_and_train  # noqa: E402


def _blocks(x: np.ndarray, K: int) -> tuple[np.ndarray, int]:
    n = x.size
    nb = (n + K - 1) // K
    xp = np.zeros(nb * K, np.float64)
    xp[:n] = x
    return xp.reshape(nb, K), n


def global_mulaw4(x: np.ndarray) -> np.ndarray:
    """The retired global-mu-law q4 codebook (round-3 semantics)."""
    mu = 255.0
    V = max(1.0, float(np.abs(x).max()))
    q = np.rint(7.0 * np.log1p(mu * np.clip(np.abs(x) / V, 0, 1)) / np.log1p(mu))
    return np.sign(x) * np.expm1(q * np.log1p(mu) / 7.0) * V / mu


def block_linear4(x: np.ndarray, K: int) -> np.ndarray:
    xb, n = _blocks(x, K)
    pk = np.maximum(np.abs(xb).max(1), 1e-12)
    q = np.rint(xb / pk[:, None] * 7.0)
    return (q * pk[:, None] / 7.0).reshape(-1)[:n]


def dpcm4(x: np.ndarray, K: int) -> np.ndarray:
    """Closed-loop DPCM, vectorized per block.

    Within a block the step s is constant, so the unclipped closed loop is
    exactly value-quantization onto the grid acc0 + Z*s; only blocks where
    a code would exceed +-7 (boundary scale shrinks, or a diff lands at the
    rint edge) fall back to the true sequential loop with clipping.
    """
    xb, n = _blocks(x, K)
    flat = xb.reshape(-1)
    d = np.diff(flat, prepend=flat[0]).reshape(xb.shape)
    pk = np.maximum(np.abs(d).max(1), 1e-12)
    out = np.empty_like(xb)
    acc = 0.0
    for b in range(xb.shape[0]):
        s = pk[b] / 7.0
        c = np.rint((xb[b] - acc) / s)
        codes = np.diff(c)
        if abs(c[0]) <= 7 and (np.abs(codes) <= 7).all():
            rec = acc + c * s
        else:
            rec = np.empty(K)
            a = acc
            for j in range(K):
                q = min(7.0, max(-7.0, np.rint((xb[b, j] - a) / s)))
                a += q * s
                rec[j] = a
            # re-anchor the following block on the clipped trajectory
        acc = rec[-1]
        out[b] = rec
    return out.reshape(-1)[:n]


def dpcm4_parallel(x: np.ndarray, K: int) -> np.ndarray:
    """The transport-feasible DPCM form: within a block every c_j is an
    INDEPENDENT rint against the block anchor (so encode vectorizes and
    decode is one global cumsum(code*step)), with the step sized so code
    diffs provably fit +-7: s = max(within-block diff peak / 6, anchor
    jump / 6.5). ~17% coarser than the clip-fallback closed loop, but
    code-range safety is a bound, not an empirical hope."""
    xb, n = _blocks(x, K)
    out = np.empty_like(xb)
    A = 0.0
    worst = 0.0
    for b in range(xb.shape[0]):
        row = xb[b]
        pk = np.abs(np.diff(row)).max() if K > 1 else 0.0
        s = max(pk / 6.0, abs(row[0] - A) / 6.5, 1e-12)
        c = np.rint((row - A) / s)
        worst = max(worst, abs(c[0]), np.abs(np.diff(c)).max())
        out[b] = A + c * s
        A = out[b, -1]
    assert worst <= 7, f'code range violated: {worst}'
    return out.reshape(-1)[:n]


SCHEMES = {
    'global-mulaw (retired r3 q4)': (global_mulaw4, 0.0),
    'block-linear K=16': (lambda x: block_linear4(x, 16), 1 / 16),
    'block-linear K=64': (lambda x: block_linear4(x, 64), 1 / 64),
    'dpcm K=64': (lambda x: dpcm4(x, 64), 1 / 64),
    'dpcm K=256': (lambda x: dpcm4(x, 256), 1 / 256),
    'dpcm-parallel K=64': (lambda x: dpcm4_parallel(x, 64), 1 / 64),
    'dpcm-parallel K=256': (lambda x: dpcm4_parallel(x, 256), 1 / 256),
}


def main() -> None:
    args = build_parser().parse_args()
    import jax.numpy as jnp

    ns = setup_and_train(args)
    for name, (fn, overhead) in SCHEMES.items():
        rec = {
            c: np.stack([fn(row.astype(np.float64)).astype(np.float32) for row in v])
            for c, v in ns.eval_f32.items()
        }
        test = np.asarray(
            ns.fwd_f32(ns.variables, {c: jnp.asarray(v) for c, v in rec.items()})
        )
        acc = float((test.argmax(-1) == ns.eval_y).mean())
        print(
            json.dumps(
                {
                    'config': f'probe: {name} (host-sim 4-bit) vs f32 lossless',
                    **ns.base,
                    'probe_eval_acc': round(acc, 4),
                    'acc_delta': round(acc - ns.f32_acc, 5),
                    'scale_overhead_bytes_per_sample': round(overhead, 5),
                    **{k: round(v, 5) for k, v in compare(ns.ref, test).items()},
                }
            )
        )


if __name__ == '__main__':
    main()
