"""Progressive accumulation film.

Replaces ``CudaFrameBuffer`` (reference src/volumeRender.cpp:358-389): an
RGB+heat sum buffer plus per-pixel sample counts.  Where the reference
tracks one global spp (every pixel advances together, one kernel launch per
sample), the wavefront pool retires samples asynchronously, so counts are
per-pixel; once a render completes, every pixel has the same count again.

Internally padded by one dummy row so masked scatter-adds from the wavefront
can dump retired-lane contributions of parked lanes harmlessly.

Unlike the reference (which only ever resets), films serialize — true
checkpoint/resume of a progressive render (SURVEY.md §5).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Film:
    sum: jnp.ndarray     # (npix + 1, 4): rgb + heat; last row is a sink
    count: jnp.ndarray   # (npix + 1,) f32
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)


def make_film(width: int, height: int) -> Film:
    npix = width * height
    return Film(sum=jnp.zeros((npix + 1, 4), jnp.float32),
                count=jnp.zeros((npix + 1,), jnp.float32),
                width=width, height=height)


def reset(film: Film) -> Film:
    """fb->reset() (volumeRender.cpp:374-378)."""
    return film.replace(sum=jnp.zeros_like(film.sum),
                        count=jnp.zeros_like(film.count))


def add_samples(film: Film, pixel_idx: jnp.ndarray, value: jnp.ndarray,
                mask: jnp.ndarray) -> Film:
    """Scatter-add retired samples. ``value`` is (N,4); masked lanes go to
    the sink row."""
    npix = film.width * film.height
    idx = jnp.where(mask, pixel_idx, npix)
    return film.replace(
        sum=film.sum.at[idx].add(jnp.where(mask[:, None], value, 0.0)),
        count=film.count.at[idx].add(mask.astype(jnp.float32)))


def image(film: Film) -> jnp.ndarray:
    """Mean radiance (H, W, 3) — ``scaledOutput`` (volumeRender.cpp:381)."""
    c = jnp.maximum(film.count[:-1], 1.0)
    rgb = film.sum[:-1, :3] / c[:, None]
    return rgb.reshape(film.height, film.width, 3)


def heat(film: Film) -> jnp.ndarray:
    """Mean scatter count per pixel (the alpha-channel heat of
    kernel.cu:2309-2317)."""
    c = jnp.maximum(film.count[:-1], 1.0)
    return (film.sum[:-1, 3] / c).reshape(film.height, film.width)


def spp(film: Film) -> jnp.ndarray:
    return film.count[:-1].reshape(film.height, film.width)


def to_numpy_state(film: Film) -> dict:
    """Serializable checkpoint (resume support)."""
    return {"sum": np.asarray(film.sum), "count": np.asarray(film.count),
            "width": film.width, "height": film.height}


def from_numpy_state(d: dict) -> Film:
    return Film(sum=jnp.asarray(d["sum"]), count=jnp.asarray(d["count"]),
                width=int(d["width"]), height=int(d["height"]))
