"""Progressive accumulation film.

Replaces ``CudaFrameBuffer`` (reference src/volumeRender.cpp:358-389): an
RGB+heat sum buffer plus per-pixel sample counts.  Where the reference
tracks one global spp (every pixel advances together, one kernel launch per
sample), the wavefront pool retires samples asynchronously, so counts are
per-pixel; once a render completes, every pixel has the same count again.

Storage is one (npix + 1, 8) array — rgb, heat, count, rgb² — so
retirement is a *single* row scatter-add (scatter-adds cost per-row on TPU
like gathers; two separate adds for sum and count measurably doubled the
accumulation cost).  The rgb² lanes give per-pixel sample variance for
free (variance-scaled statistical tests, variance-guided denoising).  The
extra dummy row is a sink for masked lanes.

Unlike the reference (which only ever resets), films serialize — true
checkpoint/resume of a progressive render (SURVEY.md §5).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Film:
    data: jnp.ndarray    # (npix + 1, 8): r, g, b, heat, count, r², g², b²
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


def add_rows(film: Film, pixel_idx: jnp.ndarray, rows: jnp.ndarray,
             mask: jnp.ndarray) -> Film:
    """Scatter-add pre-accumulated film rows (the film's own layout:
    rgb, heat, count, rgb²).  Masked lanes go to the sink row."""
    npix = film.width * film.height
    idx = jnp.where(mask, pixel_idx, npix)
    rows = jnp.where(mask[:, None], rows, 0.0)
    return film.replace(data=film.data.at[idx].add(rows))


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


def variance(film: Film) -> jnp.ndarray:
    """Per-pixel per-channel sample variance E[x²] − E[x]², (H, W, 3).

    New capability over the reference framebuffer (which stores only the
    sum, volumeRender.cpp:358-389) — powers variance-scaled statistical
    assertions and variance-guided denoise weighting."""
    c = jnp.maximum(film.count[:-1], 1.0)[:, None]
    mean = film.data[:-1, :3] / c
    mean_sq = film.data[:-1, 5:8] / c
    v = jnp.maximum(mean_sq - mean * mean, 0.0)
    return v.reshape(film.height, film.width, 3)


def merge(films: list) -> Film:
    """Sum accumulation states.  Films rendered with *disjoint* sample
    ranges (``integrator.render(..., sample_offset=...)``) merge exactly:
    RNG streams are (pixel, sample)-keyed, so independent hosts/processes
    produce the same sample set a single render would — multi-host
    scale-out with zero communication (tools/merge_films.py)."""
    out = films[0]
    for f in films[1:]:
        if (f.width, f.height) != (out.width, out.height):
            raise ValueError("cannot merge films of different sizes")
        out = out.replace(data=out.data + f.data)
    return out


def to_numpy_state(film: Film) -> dict:
    """Serializable checkpoint (resume support)."""
    return {"sum": np.asarray(film.sum), "count": np.asarray(film.count),
            "sumsq": np.asarray(film.data[:, 5:8]),
            "width": film.width, "height": film.height}


def from_numpy_state(d: dict) -> Film:
    npix = int(d["width"]) * int(d["height"])
    data = np.zeros((npix + 1, 8), np.float32)
    data[:, :4] = d["sum"]
    data[:, 4] = d["count"]
    if "sumsq" in d:  # older checkpoints lack the variance lanes
        data[:, 5:8] = d["sumsq"]
    return Film(data=jnp.asarray(data),
                width=int(d["width"]), height=int(d["height"]))
