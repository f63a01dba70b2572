"""In-graph classification metrics.

The reference accumulates torchmetrics confusion matrices and all-reduces
them over DDP (src/wav2sleep/trainer/main.py:41-59, 170-172). Here the
confusion matrix is a scatter-add inside the jitted step — under data
parallelism XLA turns the accumulation into a ``psum`` over ICI
automatically; the host only ever sees the final [C, C] ints.
"""

from __future__ import annotations

import jax.numpy as jnp


def confusion_matrix(logits_or_preds: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
                     from_logits: bool = True) -> jnp.ndarray:
    """[C, C] confusion matrix (rows = true, cols = predicted); labels < 0
    are ignored (the reference's ``ignore_index=-1``)."""
    preds = jnp.argmax(logits_or_preds, axis=-1) if from_logits else logits_or_preds
    preds = preds.reshape(-1)
    labels = labels.reshape(-1).astype(jnp.int32)
    valid = labels >= 0
    idx = jnp.where(valid, labels * num_classes + preds, 0)
    counts = jnp.zeros(num_classes * num_classes, dtype=jnp.int32)
    counts = counts.at[idx].add(valid.astype(jnp.int32))
    return counts.reshape(num_classes, num_classes)


def cross_entropy_ignore_index(logits_NC: jnp.ndarray, labels_N: jnp.ndarray,
                               label_smoothing: float = 0.0) -> jnp.ndarray:
    """Mean cross-entropy over non-ignored labels (torch
    ``CrossEntropyLoss(reduction='mean', ignore_index=-1)`` parity)."""
    labels = labels_N.astype(jnp.int32)
    valid = labels >= 0
    safe = jnp.where(valid, labels, 0)
    logp = logits_NC.astype(jnp.float32)
    log_probs = logp - jnp.max(logp, axis=-1, keepdims=True)
    log_probs = log_probs - jnp.log(jnp.sum(jnp.exp(log_probs), axis=-1, keepdims=True))
    n_classes = logits_NC.shape[-1]
    nll = -jnp.take_along_axis(log_probs, safe[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(log_probs, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count
