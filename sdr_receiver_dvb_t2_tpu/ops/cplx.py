"""Real-pair complex arithmetic for the device compute path.

The TPU runtime in this environment implements no complex dtypes (any
program touching complex64 fails with UNIMPLEMENTED), and split re/im
planes are the better TPU layout anyway: every elementwise op vectorizes
on the VPU without the interleave/deinterleave shuffles complex emulation
needs, and complex matmuls become plain MXU matmuls on stacked operands.

``C`` is a NamedTuple (re, im) — automatically a JAX pytree, so it passes
transparently through jit / vmap / scan / shard_map.  Host code (NumPy
fixtures, params) keeps using native complex; convert at the device
boundary with :func:`from_np` / :func:`to_np`.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np
import jax.numpy as jnp


class C(NamedTuple):
    re: Any
    im: Any

    # ---- array-ish metadata ------------------------------------------------
    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    def reshape(self, *s):
        return C(self.re.reshape(*s), self.im.reshape(*s))

    def astype(self, dt):
        return C(self.re.astype(dt), self.im.astype(dt))

    def __getitem__(self, idx):
        return C(self.re[idx], self.im[idx])

    # ---- arithmetic ---------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, C):
            return C(self.re + o.re, self.im + o.im)
        if isinstance(o, (complex, np.complexfloating)):
            return C(self.re + o.real, self.im + o.imag)
        return C(self.re + o, self.im)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, C):
            return C(self.re - o.re, self.im - o.im)
        if isinstance(o, (complex, np.complexfloating)):
            return C(self.re - o.real, self.im - o.imag)
        return C(self.re - o, self.im)

    def __neg__(self):
        return C(-self.re, -self.im)

    def __mul__(self, o):
        if isinstance(o, C):
            return C(self.re * o.re - self.im * o.im,
                     self.re * o.im + self.im * o.re)
        if isinstance(o, (complex, np.complexfloating)):
            return C(self.re * o.real - self.im * o.imag,
                     self.re * o.imag + self.im * o.real)
        return C(self.re * o, self.im * o)          # real scalar/array

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, C):
            d = o.re * o.re + o.im * o.im
            return (self * o.conj()) * (1.0 / d)
        if isinstance(o, (complex, np.complexfloating)):
            return self.__truediv__(C(jnp.float32(o.real), jnp.float32(o.imag)))
        return C(self.re / o, self.im / o)

    # ---- complex ops ---------------------------------------------------------
    def conj(self):
        return C(self.re, -self.im)

    def abs2(self):
        return self.re * self.re + self.im * self.im

    def abs(self):
        return jnp.sqrt(self.abs2())

    def angle(self):
        return jnp.arctan2(self.im, self.re)


# ---- constructors / converters ----------------------------------------------

def cexp(theta) -> C:
    """e^{j*theta} as a real pair."""
    return C(jnp.cos(theta), jnp.sin(theta))


def czeros(shape, dtype=jnp.float32) -> C:
    return C(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def from_np(x: np.ndarray) -> C:
    """Host complex ndarray -> C of float32 ndarrays (device boundary)."""
    x = np.asarray(x)
    return C(np.ascontiguousarray(x.real).astype(np.float32),
             np.ascontiguousarray(x.imag).astype(np.float32))


def to_np(c: C) -> np.ndarray:
    return np.asarray(c.re) + 1j * np.asarray(c.im)


def take(c: C, idx, **kw) -> C:
    return C(jnp.take(c.re, idx, **kw), jnp.take(c.im, idx, **kw))


def take_along_axis(c: C, idx, axis) -> C:
    return C(jnp.take_along_axis(c.re, idx, axis=axis),
             jnp.take_along_axis(c.im, idx, axis=axis))


def where(pred, a, b) -> C:
    a = a if isinstance(a, C) else C(jnp.asarray(a, jnp.float32), jnp.zeros((), jnp.float32))
    b = b if isinstance(b, C) else C(jnp.asarray(b, jnp.float32), jnp.zeros((), jnp.float32))
    return C(jnp.where(pred, a.re, b.re), jnp.where(pred, a.im, b.im))


def concatenate(cs, axis=0) -> C:
    return C(jnp.concatenate([c.re for c in cs], axis=axis),
             jnp.concatenate([c.im for c in cs], axis=axis))


def stack_ri(c: C, axis=0):
    """C -> one real array with a new re/im axis (for convs, FFT matmuls)."""
    return jnp.stack([c.re, c.im], axis=axis)


def unstack_ri(x, axis=0) -> C:
    r, i = jnp.split(x, 2, axis=axis)
    return C(jnp.squeeze(r, axis), jnp.squeeze(i, axis))


def sum(c: C, axis=None, **kw) -> C:          # noqa: A001
    return C(jnp.sum(c.re, axis=axis, **kw), jnp.sum(c.im, axis=axis, **kw))


def mean(c: C, axis=None, **kw) -> C:
    return C(jnp.mean(c.re, axis=axis, **kw), jnp.mean(c.im, axis=axis, **kw))


def cumsum(c: C, axis=0) -> C:
    return C(jnp.cumsum(c.re, axis=axis), jnp.cumsum(c.im, axis=axis))


def roll(c: C, shift, axis) -> C:
    return C(jnp.roll(c.re, shift, axis=axis), jnp.roll(c.im, shift, axis=axis))
