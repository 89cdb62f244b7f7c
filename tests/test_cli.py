"""Render-job CLI smoke test (apps.render_cli)."""

import numpy as np

from cuda_volpath_tpu.apps import render_cli
from cuda_volpath_tpu.io import ppm, hdr


def test_cli_blob_render(tmp_path):
    out = tmp_path / "out.ppm"
    heat = tmp_path / "heat.ppm"
    ckpt = tmp_path / "film.npz"
    rc = render_cli.main([
        "--scene", "blob", "--size", "16x16", "--spp", "2",
        "--density", "20", "--steps-per-launch", "4",
        "--pool", "256", "--denoise",
        "-o", str(out), "--heat", str(heat), "--checkpoint", str(ckpt)])
    assert rc == 0
    img = ppm.read_ppm(str(out))
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()
    himg = hdr.read_hdr(str(out.with_suffix(".hdr")))
    assert himg.shape == (16, 16, 3)
    assert ckpt.exists()

    # resume adds fresh samples — it continues after the film's highest
    # accumulated index (never re-drawing (pixel, sample) duplicates)
    rc = render_cli.main([
        "--scene", "blob", "--size", "16x16", "--spp", "2",
        "--density", "20", "--steps-per-launch", "4",
        "--pool", "256", "-o", str(out), "--checkpoint", str(ckpt)])
    assert rc == 0
    from cuda_volpath_tpu.render import film as filmmod
    f = filmmod.from_numpy_state(
        {k: v for k, v in np.load(ckpt).items()})
    assert float(np.asarray(filmmod.spp(f)).min()) == 4.0
    # the second pass rendered the K-aligned range [8, 10), not [0, 2)
    # again — re-drawing would make the two halves exact duplicates
    import cuda_volpath_tpu.render.integrator as integ
    from cuda_volpath_tpu import scenes
    from cuda_volpath_tpu.config import Param, RenderSettings
    from cuda_volpath_tpu.render.scene import materials_from_param
    from cuda_volpath_tpu.render import camera as cammod
    scene, _, _ = scenes.gaussian_blob(32)
    scene = scene.replace(mat=materials_from_param(Param(density=20.0)))
    cam = cammod.make_camera()
    s = RenderSettings(steps_per_launch=4)
    fa = integ.render(scene, cam, s, 16, 16, 2, pool=256, sample_offset=0)
    fb = integ.render(scene, cam, s, 16, 16, 2, pool=256, sample_offset=8)
    expect = filmmod.merge([fa, fb])
    np.testing.assert_allclose(np.asarray(f.data), np.asarray(expect.data),
                               rtol=1e-5, atol=1e-6)

    # third run: the checkpoint's recorded next_sample (10) keys the
    # resume — K-rounding continues at [16, 18).  Before next_sample was
    # persisted, the offset was re-derived from the accumulated count (4),
    # which rounds to 8 and re-renders [8, 10) — exact (pixel, sample)
    # duplicates (caught here: the film would differ from the disjoint
    # three-range merge)
    assert int(np.load(ckpt)["next_sample"]) == 10
    rc = render_cli.main([
        "--scene", "blob", "--size", "16x16", "--spp", "2",
        "--density", "20", "--steps-per-launch", "4",
        "--pool", "256", "-o", str(out), "--checkpoint", str(ckpt)])
    assert rc == 0
    f = filmmod.from_numpy_state(
        {k: v for k, v in np.load(ckpt).items()})
    assert float(np.asarray(filmmod.spp(f)).min()) == 6.0
    fc = integ.render(scene, cam, s, 16, 16, 2, pool=256, sample_offset=16)
    expect = filmmod.merge([fa, fb, fc])
    np.testing.assert_allclose(np.asarray(f.data), np.asarray(expect.data),
                               rtol=1e-5, atol=1e-6)

    # pre-next_sample checkpoints (older format) still resume: the count
    # fallback equals next_sample whenever coverage is a contiguous prefix
    state = {k: v for k, v in np.load(ckpt).items()}
    state.pop("next_sample")
    np.savez(ckpt, **state)
    rc = render_cli.main([
        "--scene", "blob", "--size", "16x16", "--spp", "2",
        "--density", "20", "--steps-per-launch", "4",
        "--pool", "256", "-o", str(out), "--checkpoint", str(ckpt)])
    assert rc == 0
    f2 = filmmod.from_numpy_state(
        {k: v for k, v in np.load(ckpt).items()})
    assert float(np.asarray(filmmod.spp(f2)).min()) == 8.0


def test_cli_periodic_checkpoint_and_failure_recovery(tmp_path, monkeypatch):
    """--checkpoint-every snapshots the film mid-render (atomic tmp+rename)
    so a backend failure loses at most one interval; a failing render exits
    1 with the resume hint instead of a traceback."""
    out = tmp_path / "out.ppm"
    ckpt = tmp_path / "film.npz"
    rc = render_cli.main([
        "--scene", "blob", "--size", "16x16", "--spp", "4",
        "--density", "20", "--steps-per-launch", "4", "--pool", "64",
        "--checkpoint-every", "0.0001", "--report-every", "10000",
        "-o", str(out), "--checkpoint", str(ckpt)])
    assert rc == 0 and ckpt.exists()
    assert not (tmp_path / "film.npz.tmp.npz").exists()  # rename completed

    # simulate a mid-render backend failure: resume from the checkpoint,
    # then die inside the launch loop — the CLI must keep the checkpoint
    # and return 1, not raise
    from cuda_volpath_tpu.render import integrator

    def boom(*a, **kw):
        raise RuntimeError("UNAVAILABLE: tunnel gone")
    monkeypatch.setattr(integrator, "render", boom)
    rc = render_cli.main([
        "--scene", "blob", "--size", "16x16", "--spp", "8",
        "--density", "20", "--steps-per-launch", "4", "--pool", "64",
        "-o", str(out), "--checkpoint", str(ckpt)])
    assert rc == 1 and ckpt.exists()


def test_merge_films_tool(tmp_path):
    """tools/merge_films.py sums checkpoints from disjoint sample ranges
    into one resumable film and can export the image."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    import merge_films

    args = ["--scene", "blob", "--size", "8x8", "--spp", "8",
            "--density", "20", "--steps-per-launch", "4", "--pool", "64"]
    a, b = tmp_path / "a.npz", tmp_path / "b.npz"
    assert render_cli.main(args + ["--sample-offset", "0",
                                   "-o", str(tmp_path / "a.ppm"),
                                   "--checkpoint", str(a)]) == 0
    assert render_cli.main(args + ["--sample-offset", "8",
                                   "-o", str(tmp_path / "b.ppm"),
                                   "--checkpoint", str(b)]) == 0
    out = tmp_path / "m.npz"
    img = tmp_path / "m.ppm"
    old_argv = sys.argv
    try:
        sys.argv = ["merge_films.py", str(a), str(b),
                    "-o", str(out), "--ppm", str(img)]
        assert merge_films.main() == 0
    finally:
        sys.argv = old_argv
    from cuda_volpath_tpu.render import film as filmmod
    m = filmmod.from_numpy_state({k: v for k, v in np.load(out).items()})
    assert (np.asarray(filmmod.spp(m)) == 16).all()
    assert ppm.read_ppm(str(img)).shape == (8, 8, 3)


def test_argparser_covers_reference_params():
    p = render_cli.build_argparser()
    a = p.parse_args(["--preset", "3", "--tracker", "delta",
                      "--filter", "linear", "--no-sun"])
    assert a.preset == 3 and a.tracker == "delta"
    # the compile-time switches are runtime CLI flags (SURVEY §2.3)
    a = p.parse_args(["--spectral", "mono", "--envmap-mode", "mis",
                      "--envmap", "x.hdr", "--envmap-brightness", "2.5"])
    assert a.spectral == "mono" and a.envmap_mode == "mis"
    assert a.envmap == "x.hdr" and a.envmap_brightness == 2.5


def test_cli_hdr_envmap_and_spectral_modes(tmp_path):
    """--envmap FILE.hdr replaces the scene light (EnvMapLoader,
    volumeRender.cpp:223-236) and --spectral/--envmap-mode select the
    kernel.cu:21-27 compile-time modes at runtime."""
    env = tmp_path / "env.hdr"
    img = np.zeros((8, 16, 3), np.float32)
    img[:4] = (0.2, 0.5, 1.0)  # sky-ish upper half
    img[4:] = (0.3, 0.2, 0.1)
    hdr.write_hdr(str(env), img, flip_y=False)

    out = tmp_path / "env_out.ppm"
    rc = render_cli.main([
        "--scene", "blob", "--size", "16x16", "--spp", "2",
        "--density", "20", "--steps-per-launch", "4", "--pool", "256",
        "--envmap", str(env), "--envmap-brightness", "2.0",
        "--envmap-mode", "mis", "--spectral", "mono", "--no-sun",
        "-o", str(out)])
    assert rc == 0
    got = hdr.read_hdr(str(out.with_suffix(".hdr")))
    assert got.shape == (16, 16, 3) and np.isfinite(got).all()
    # border pixels miss the blob and see the (2× brightened) envmap
    # directly; the blob occupies the frame center
    corner = got[0, 0]
    assert np.allclose(corner, 2.0 * img[0, 0], rtol=0.02)


def test_half_block_frame():
    import numpy as np
    from cuda_volpath_tpu.apps import view
    img = np.zeros((4, 3, 3), np.float32)
    img[0, 0] = (1.0, 0.0, 0.0)
    txt = view._half_block_frame(img)
    assert txt.count("▀") == 6  # 3 wide × (4/2) rows
    assert "38;2;255;0;0" in txt
