"""Sample-quality metrics: Inception Score and Frechet (FID/FVD) distance.

The reference tracked Inception Score through a module that is missing from its
own repo (``on_dev.evaluation_metrics`` — the import is commented out in the live
scripts, reference mnist_moco_ode.py:7,169-173, and active only in dead code,
models/moco_ode.py:79). This module supplies the actual math, generic over any
feature/probability extractor:

* ``inception_score(probs)``: exp(E_x KL(p(y|x) || p(y))) with the standard
  10-split mean/std protocol (Salimans et al. 2016).
* ``frechet_distance``: ||mu1 - mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^{1/2}), the
  FID (Heusel et al. 2017) / FVD (Unterthiner et al. 2018) core. The trace of
  the matrix square root is computed from the eigenvalues of S1 @ S2 (similar to
  a PSD matrix, hence real non-negative spectrum) — no scipy sqrtm needed, runs
  on device.

For true-FVD comparisons a pretrained I3D is required (not available in this
offline environment); ``ganode_tpu.eval.embedder`` provides a trainable video
embedder as the feature function for tracking *relative* progress.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def inception_score(probs, splits: int = 10) -> Tuple[float, float]:
    """probs: (N, C) class probabilities (rows sum to 1). Returns (mean, std)
    of exp(E KL(p(y|x) || p(y))) over ``splits`` chunks."""
    probs = np.asarray(probs, np.float64)
    n = probs.shape[0]
    scores = []
    for i in range(splits):
        part = probs[i * n // splits:(i + 1) * n // splits]
        if len(part) == 0:
            continue
        marginal = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(marginal + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def feature_stats(features) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, D) features -> (mu (D,), sigma (D, D))."""
    features = jnp.asarray(features)
    mu = jnp.mean(features, axis=0)
    centered = features - mu
    sigma = centered.T @ centered / (features.shape[0] - 1)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """Frechet distance between two Gaussians.

    Runs on host numpy: the general eigendecomposition has no TPU lowering and
    this is an O(D^3) eval-time metric on a ~128-dim feature space.
    """
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)
    diff = np.sum((mu1 - mu2) ** 2)
    # Tr((S1 S2)^{1/2}) via the eigenvalues of S1 @ S2 (real, >= 0 up to noise)
    eigs = np.linalg.eigvals(sigma1 @ sigma2)
    tr_sqrt = np.sum(np.sqrt(np.clip(np.real(eigs), 0.0, None)))
    return float(diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_sqrt)


def fvd(real_features, fake_features) -> float:
    """Frechet Video Distance given (N, D) feature matrices from any embedder."""
    mu_r, s_r = feature_stats(real_features)
    mu_f, s_f = feature_stats(fake_features)
    return frechet_distance(mu_r, s_r, mu_f, s_f)


def score_generator(
    sample_fn: Callable[[jax.Array, int], np.ndarray],
    prob_fn: Callable[[np.ndarray], np.ndarray],
    *,
    n_samples: int = 1000,
    batch_size: int = 100,
    key=None,
    splits: int = 10,
) -> Tuple[float, float]:
    """End-to-end IS: sample batches from the generator, classify, score —
    the loop the reference ran as calculate_inception_score
    (reference models/moco_ode.py:125-128 calls a module missing from the repo).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    all_probs = []
    for i in range(0, n_samples, batch_size):
        n = min(batch_size, n_samples - i)
        samples = sample_fn(jax.random.fold_in(key, i), n)
        all_probs.append(np.asarray(prob_fn(samples)))
    return inception_score(np.concatenate(all_probs), splits=splits)
