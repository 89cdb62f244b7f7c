#!/usr/bin/env python3
"""Merge film checkpoints from independent renders into one.

The zero-communication multi-host workflow: each host renders a disjoint
absolute sample range of the same scene

    host A:  render_cli ... --spp 256 --sample-offset 0   --checkpoint a.npz
    host B:  render_cli ... --spp 256 --sample-offset 256 --checkpoint b.npz

and because RNG streams are keyed by (pixel, absolute sample), the union
of their samples is exactly what one 512-spp render would draw.  This tool
sums the accumulation states (rgb, heat, count, rgb² are all additive):

    python tools/merge_films.py a.npz b.npz -o merged.npz [--ppm out.ppm]

The merged checkpoint is a normal film: resume from it, denoise it, or
export it here.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+", help="film checkpoints (.npz)")
    ap.add_argument("-o", "--output", required=True,
                    help="merged checkpoint path (.npz)")
    ap.add_argument("--ppm", default=None,
                    help="also export the merged mean image (gamma 2.2)")
    ap.add_argument("--hdr", default=None,
                    help="also export the merged mean image as Radiance")
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np
    from cuda_volpath_tpu.render import film as filmmod

    films = [filmmod.from_numpy_state(
        {k: v for k, v in np.load(p).items()}) for p in args.inputs]
    merged = filmmod.merge(films)
    tmp = args.output + ".tmp.npz"
    np.savez_compressed(tmp, **filmmod.to_numpy_state(merged))
    os.replace(tmp, args.output)
    spp = np.asarray(filmmod.spp(merged))
    print(f"# merged {len(films)} films -> {args.output} "
          f"(spp min {spp.min():.0f} max {spp.max():.0f})", file=sys.stderr)

    if args.ppm or args.hdr:
        from cuda_volpath_tpu.render import postprocess
        img = filmmod.image(merged)
        if args.ppm:
            from cuda_volpath_tpu.io import ppm as ppmio
            ppmio.write_ppm(args.ppm, np.asarray(
                postprocess.tonemap_display(img, 2.2)))
            print(f"# wrote {args.ppm}", file=sys.stderr)
        if args.hdr:
            from cuda_volpath_tpu.io import hdr as hdrio
            hdrio.write_hdr(args.hdr, np.asarray(img))
            print(f"# wrote {args.hdr}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
