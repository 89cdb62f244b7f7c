"""Progressive accumulation film.

Replaces ``CudaFrameBuffer`` (reference src/volumeRender.cpp:358-389): an
RGB+heat sum buffer plus per-pixel sample counts.  Where the reference
tracks one global spp (every pixel advances together, one kernel launch per
sample), the wavefront pool retires samples asynchronously, so counts are
per-pixel; once a render completes, every pixel has the same count again.

Storage is one (npix + 1, 8) array — rgb, heat, count, 3 spare lanes — so
retirement is a *single* row scatter-add (scatter-adds cost per-row on TPU
like gathers; two separate adds for sum and count measurably doubled the
accumulation cost).  The extra dummy row is a sink for masked lanes.

Unlike the reference (which only ever resets), films serialize — true
checkpoint/resume of a progressive render (SURVEY.md §5).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Film:
    data: jnp.ndarray    # (npix + 1, 8): r, g, b, heat, count, spare×3
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)

    @property
    def sum(self) -> jnp.ndarray:
        """(npix + 1, 4) rgb + heat sums."""
        return self.data[:, :4]

    @property
    def count(self) -> jnp.ndarray:
        """(npix + 1,) per-pixel sample counts."""
        return self.data[:, 4]


def make_film(width: int, height: int) -> Film:
    npix = width * height
    return Film(data=jnp.zeros((npix + 1, 8), jnp.float32),
                width=width, height=height)


def reset(film: Film) -> Film:
    """fb->reset() (volumeRender.cpp:374-378)."""
    return film.replace(data=jnp.zeros_like(film.data))


def add_samples(film: Film, pixel_idx: jnp.ndarray, value: jnp.ndarray,
                mask: jnp.ndarray) -> Film:
    """Scatter-add retired samples. ``value`` is (N, 4) rgb+heat; masked
    lanes go to the sink row."""
    npix = film.width * film.height
    idx = jnp.where(mask, pixel_idx, npix)
    row = jnp.concatenate(
        [value, mask.astype(jnp.float32)[:, None],
         jnp.zeros(value.shape[:-1] + (3,), jnp.float32)], axis=-1)
    row = jnp.where(mask[:, None], row, 0.0)
    return film.replace(data=film.data.at[idx].add(row))


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
    npix = int(d["width"]) * int(d["height"])
    data = np.zeros((npix + 1, 8), np.float32)
    data[:, :4] = d["sum"]
    data[:, 4] = d["count"]
    return Film(data=jnp.asarray(data),
                width=int(d["width"]), height=int(d["height"]))
