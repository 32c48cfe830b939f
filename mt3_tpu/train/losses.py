"""Loss functions: cross entropy with z-loss and label smoothing.

Semantics of the t5x loss the reference binds via gin
(/root/reference/mt3/gin/model.gin:12-17: z_loss=1e-4, label_smoothing=0,
loss_normalizing_factor=None; pretrain uses label_smoothing=0.1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def cross_entropy_with_z_loss(
    logits: Array,            # [b, len, vocab] float32
    targets: Array,           # [b, len] int32
    weights: Array,           # [b, len] loss weights (non-padding = 1)
    label_smoothing: float = 0.0,
    z_loss: float = 0.0,
) -> Tuple[Array, Array, Array]:
  """Returns (total_loss, z_loss_term, weight_sum).

  total_loss is summed over tokens (t5x convention with
  loss_normalizing_factor=None); callers divide by weight_sum for
  per-token metrics.  z_loss penalizes log^2(Z) which keeps logits from
  drifting and makes the softmax numerics stable in bfloat16 training.
  """
  vocab_size = logits.shape[-1]
  confidence = 1.0 - label_smoothing
  low_confidence = label_smoothing / (vocab_size - 1)
  normalizing_constant = -(
      confidence * jnp.log(confidence + 1e-20)
      + (vocab_size - 1) * low_confidence
      * jnp.log(low_confidence + 1e-20))

  one_hot = jax.nn.one_hot(targets, vocab_size)
  soft_targets = one_hot * confidence + (1.0 - one_hot) * low_confidence

  log_z = jax.nn.logsumexp(logits, axis=-1)
  log_softmax = logits - log_z[..., None]
  ce = -jnp.sum(soft_targets * log_softmax, axis=-1) - normalizing_constant

  z_term = z_loss * jnp.square(log_z)
  per_token = (ce + z_term) * weights

  total = jnp.sum(per_token)
  total_z = jnp.sum(z_term * weights)
  weight_sum = jnp.sum(weights)
  return total, total_z, weight_sum


def compute_metrics(logits: Array, targets: Array,
                    weights: Array) -> dict:
  """Token-level accuracy and cross entropy for logging."""
  predictions = jnp.argmax(logits, axis=-1)
  correct = (predictions == targets).astype(jnp.float32) * weights
  weight_sum = jnp.maximum(jnp.sum(weights), 1e-8)
  return {
      'accuracy': jnp.sum(correct) / weight_sum,
      'weight_sum': jnp.sum(weights),
  }
