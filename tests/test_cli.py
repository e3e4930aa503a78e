"""CLI smoke tests (run in-process on the CPU backend)."""

import json
import os

import numpy as np
import pytest

from splat_tpu.cli import main
from splat_tpu.io.ply import save_ply
from splat_tpu.utils.fixtures import random_scene
from splat_tpu.utils.image import read_png


@pytest.fixture()
def scene_ply(tmp_path):
    p = tmp_path / "s.ply"
    save_ply(p, random_scene(64, seed=1, extent=1.5,
                             scale_range=(0.05, 0.15)))
    return str(p)


def test_render_naive(tmp_path, capsys):
    out = str(tmp_path / "naive.png")
    rc = main(["render", "--naive", "--size", "96x64", "--out", out,
               "--pos=-0.57651054,2.99040512,-0.03924271"])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (64, 96, 3)
    assert img.max() > 0  # something rendered
    assert "Rendering took" in capsys.readouterr().out


def test_render_sigma_cutoff_inf(scene_ply, tmp_path):
    """--sigma-cutoff inf selects the truncation-free mode (and parses
    through float('inf') into RenderConfig, which requires tight radii)."""
    out = str(tmp_path / "inf.png")
    rc = main(["render", scene_ply, "--size", "64x64", "--pos", "0,0,4",
               "--sigma-cutoff", "inf", "--dup-factor", "8", "--out", out])
    assert rc == 0
    assert read_png(out).shape == (64, 64, 3)


def test_render_alpha_rgba_png(scene_ply, tmp_path):
    """--alpha writes a color-type-6 RGBA PNG whose alpha plane is the
    accumulated coverage (background pixels transparent)."""
    out = str(tmp_path / "rgba.png")
    rc = main(["render", scene_ply, "--size", "64x64", "--pos", "0,0,4",
               "--alpha", "--out", out])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (64, 64, 4)
    assert img[..., 3].max() > 0  # something covered


def test_render_depth_mode(scene_ply, tmp_path):
    """--render-mode depth writes a grayscale expected-depth map; an
    explicit --depth-range parses into RenderConfig.depth_range."""
    out = str(tmp_path / "depth.png")
    rc = main(["render", scene_ply, "--size", "64x64", "--pos", "0,0,4",
               "--render-mode", "depth", "--depth-range", "1,7",
               "--out", out])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (64, 64, 3)
    # grayscale: channels equal to within one u8 step (the accumulation
    # einsum may land channels in different lanes — 1-ULP f32 drift)
    assert np.abs(img[..., 0].astype(int) - img[..., 1].astype(int)).max() <= 1
    assert img.max() > 0


def test_render_ply(scene_ply, tmp_path):
    out = str(tmp_path / "f.png")
    rc = main(["render", scene_ply, "--size", "64x64", "--pos", "0,0,4",
               "--out", out])
    assert rc == 0
    assert read_png(out).shape == (64, 64, 3)


def test_orbit(scene_ply, tmp_path):
    outdir = str(tmp_path / "frames")
    rc = main(["orbit", scene_ply, "--size", "48x32", "--pos", "0,0,4",
               "--frames", "3", "--out-dir", outdir])
    assert rc == 0
    frames = sorted(os.listdir(outdir))
    assert frames == ["frame_0000.png", "frame_0001.png", "frame_0002.png"]
    # NB: with a full 360-degree sweep the last frame equals the first;
    # compare adjacent frames.
    a = read_png(os.path.join(outdir, frames[0])).astype(np.int32)
    b = read_png(os.path.join(outdir, frames[1])).astype(np.int32)
    assert np.abs(a - b).max() > 0  # camera actually moved


def test_trim_and_info(scene_ply, tmp_path, capsys):
    out = str(tmp_path / "small.ply")
    assert main(["trim", scene_ply, out, "--count", "5"]) == 0
    capsys.readouterr()
    assert main(["info", out, "--no-center"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["num_gaussians"] == 5
    assert stats["memory_mb"] >= 0


def test_render_requires_scene():
    with pytest.raises(SystemExit):
        main(["render", "--size", "32x32"])


def test_orbit_gif(scene_ply, tmp_path):
    outdir = str(tmp_path / "frames2")
    gif = str(tmp_path / "orbit.gif")
    rc = main(["orbit", scene_ply, "--size", "48x32", "--pos", "0,0,4",
               "--frames", "3", "--out-dir", outdir, "--gif", gif])
    assert rc == 0
    data = open(gif, "rb").read()
    assert data[:6] == b"GIF89a"
    assert data[-1:] == b"\x3b"
    assert len(data) > 200


def test_fit_distill(scene_ply, tmp_path, capsys):
    """`fit --distill` optimizes a random init against orbit renders of an
    existing model and writes a loadable PLY (training as a CLI citizen —
    the reference has no training path; train.py is the engine)."""
    from splat_tpu.io.ply import load_ply

    out = str(tmp_path / "fitted.ply")
    rc = main(["fit", "--distill", scene_ply, "--init-n", "128",
               "--views", "2", "--size", "48x32", "--steps", "4",
               "--fit-method", "dense", "--seed", "1", "--out", out])
    assert rc == 0
    text = capsys.readouterr().out
    assert "reconstruction PSNR" in text
    fitted = load_ply(out, center=False)
    assert fitted.num_gaussians == 128


def test_fit_targets_dir(scene_ply, tmp_path, capsys):
    """`fit --targets DIR --cameras FILE.json` fits PNG images with poses
    from the documented JSON camera spec."""
    import jax

    import splat_tpu as st
    from splat_tpu.io.ply import load_ply
    from splat_tpu.utils.image import to_uint8, write_png

    scene = st.load_ply(scene_ply, center=False)
    tdir = tmp_path / "targets"
    tdir.mkdir()
    views = []
    for i, yaw in enumerate([0.0, 0.4]):
        cam = st.Camera.create(h=32, w=48, position=(0.0, 0.0, 4.0),
                               yaw=yaw)
        img = np.asarray(st.render(scene, cam, method="dense"))
        write_png(str(tdir / f"v{i}.png"), to_uint8(img))
        views.append({"position": [0.0, 0.0, 4.0], "yaw": yaw})
    cams_json = str(tmp_path / "cams.json")
    with open(cams_json, "w") as f:
        json.dump({"h": 32, "w": 48, "fovy_deg": 90.0, "views": views}, f)

    out = str(tmp_path / "fitted2.ply")
    rc = main(["fit", "--targets", str(tdir), "--cameras", cams_json,
               "--init-n", "128", "--steps", "4", "--fit-method", "dense",
               "--out", out])
    assert rc == 0
    assert "reconstruction PSNR" in capsys.readouterr().out
    assert load_ply(out, center=False).num_gaussians == 128


def test_fit_requires_target_source():
    with pytest.raises(SystemExit):
        main(["fit", "--out", "x.ply"])


def test_orbit_custom_path(scene_ply, tmp_path):
    """`orbit --path keyframes.json --interp K` renders an interpolated
    camera flythrough ((V-1)*K + 1 frames) instead of the yaw orbit."""
    spec = {"h": 32, "w": 48, "fovy_deg": 90.0, "views": [
        {"position": [0.0, 0.0, 4.0], "yaw": 0.0},
        {"position": [0.5, -0.5, 3.5], "yaw": 0.6, "pitch": 0.2},
    ]}
    path = str(tmp_path / "path.json")
    with open(path, "w") as f:
        json.dump(spec, f)
    outdir = str(tmp_path / "fly")
    rc = main(["orbit", scene_ply, "--path", path, "--interp", "3",
               "--out-dir", outdir])
    assert rc == 0
    frames = sorted(os.listdir(outdir))
    assert len(frames) == 4  # (2-1)*3 + 1
    a = read_png(os.path.join(outdir, frames[0])).astype(np.int32)
    b = read_png(os.path.join(outdir, frames[-1])).astype(np.int32)
    assert a.shape == (32, 48, 3)
    assert np.abs(a - b).max() > 0  # the camera moved


def test_psnr_command(scene_ply, tmp_path, capsys):
    """`psnr a.png b.png` prints one JSON line with the parity metric;
    identical images report >= 100 dB (exact-match clamp)."""
    out1 = str(tmp_path / "a.png")
    out2 = str(tmp_path / "b.png")
    assert main(["render", scene_ply, "--size", "48x32", "--pos", "0,0,4",
                 "--out", out1]) == 0
    assert main(["render", scene_ply, "--size", "48x32", "--pos", "0,0,4",
                 "--yaw", "0.3", "--out", out2]) == 0
    capsys.readouterr()
    assert main(["psnr", out1, out1]) == 0
    raw = capsys.readouterr().out
    assert "Infinity" not in raw  # strict-JSON contract (jq/JSON.parse)
    same = json.loads(raw)
    assert same["psnr_db"] == 999.0 and same["max_abs"] == 0.0
    assert main(["psnr", out1, out2]) == 0
    diff = json.loads(capsys.readouterr().out)
    assert diff["psnr_db"] < same["psnr_db"]
    assert diff["max_abs"] > 0


def test_fit_distill_tiled_targets(scene_ply, tmp_path):
    """--method tiled exercises the pack-once distill branch (the
    reference scene converts to the feature-major DeviceScene a single
    time before the per-view target renders)."""
    from splat_tpu.io.ply import load_ply

    out = str(tmp_path / "fitted3.ply")
    rc = main(["fit", "--distill", scene_ply, "--method", "tiled",
               "--init-n", "64", "--views", "2", "--size", "48x32",
               "--steps", "3", "--fit-method", "dense", "--out", out])
    assert rc == 0
    assert load_ply(out, center=False).num_gaussians == 64


def test_render_stats_flag(scene_ply, tmp_path, capsys):
    """render --stats prints the frame report JSON on stderr (tiled
    path): pair/visible counts, tile occupancy, overflow."""
    out = str(tmp_path / "s.png")
    rc = main(["render", scene_ply, "--size", "64x64", "--pos", "0,0,4",
               "--method", "tiled", "--dup-factor", "8", "--stats",
               "--out", out])
    assert rc == 0
    report = json.loads(capsys.readouterr().err.strip().splitlines()[-1])
    assert report["overflow"] == 0
    assert report["num_pairs"] > 0
    assert report["width"] == 64
