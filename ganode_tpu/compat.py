"""Drop-in reference-style API: stateful sampling sessions in torch layouts.

The reference exposes ``gen.sample_videos(n) -> (videos (B, C, T, H, W), labels)``
and ``gen.sample_images(n) -> ((B, C, H, W), None)`` with implicit global RNG
(reference models/mocogan.py:271-295). This wrapper gives reference users the
same calling convention over the functional core: it owns the variables and an
auto-advancing PRNG key, and returns channels-first tensors.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax

from .utils import layout


class GeneratorSession:
    """Stateful sampling facade over a (module, variables) pair.

    >>> gen = make_generator("ode", n_channels=1, trunk="mnist28")
    >>> sess = GeneratorSession(gen, seed=0)
    >>> videos, labels = sess.sample_videos(32)     # (32, 1, 16, 28, 28)
    >>> images, _ = sess.sample_images(32)          # (32, 1, 28, 28)
    """

    def __init__(self, gen, variables=None, *, seed: int = 0, train: bool = False):
        self.gen = gen
        self.train = train
        key = jax.random.PRNGKey(seed)
        if variables is None:
            variables = gen.init({"params": key, "sample": key}, 2)
        self.variables = variables
        self._key = jax.random.fold_in(key, 0x5A)
        self._calls = 0

    def _next_key(self):
        self._calls += 1
        return jax.random.fold_in(self._key, self._calls)

    def _apply(self, method: str, n: int, **kwargs):
        mutable = ["batch_stats"] + (
            ["spectral"] if "spectral" in self.variables else [])
        if self.train:
            (out, mut) = self.gen.apply(
                self.variables, n, method=method,
                rngs={"sample": self._next_key()}, mutable=mutable,
                train=True, **kwargs)
            self.variables = {**self.variables, **mut}
            return out
        return self.gen.apply(
            self.variables, n, method=method,
            rngs={"sample": self._next_key()}, train=False, **kwargs)

    def sample_videos(self, num_samples: int,
                      video_len: Optional[int] = None) -> Tuple[jax.Array, object]:
        """-> (videos (B, C, T, H, W) in [-1, 1], category labels or None)."""
        videos, labels = self._apply("sample_videos", num_samples,
                                     video_len=video_len)
        return layout.video_to_torch(videos), labels

    def sample_images(self, num_samples: int) -> Tuple[jax.Array, None]:
        """-> (images (B, C, H, W) in [-1, 1], None)."""
        images, _ = self._apply("sample_images", num_samples)
        return layout.image_to_torch(images), None
