import numpy as np

from splat_tpu.camera import Camera
from splat_tpu.config import RenderConfig
from splat_tpu.scene import GaussianScene
from splat_tpu.utils.diagnostics import frame_report, scene_health
from splat_tpu.utils.fixtures import naive_gaussians, random_scene


def test_scene_health_clean():
    rep = scene_health(random_scene(32, seed=0))
    assert rep["ok"]
    assert rep["means"]["nan"] == 0


def test_scene_health_detects_nans():
    scene = naive_gaussians()
    d = scene.to_numpy()
    d["means"][1, 0] = np.nan
    d["opacities"][2] = 1.5
    bad = GaussianScene(**{k: v for k, v in d.items()})
    rep = scene_health(bad)
    assert not rep["ok"]
    assert rep["means"]["nan"] == 1
    assert rep["opacities"]["out_of_range"] == 1


def test_frame_report():
    scene = random_scene(128, seed=2, extent=1.5, scale_range=(0.03, 0.1))
    cam = Camera.create(h=64, w=64, position=(0.0, 0.0, 4.0))
    rep = frame_report(scene, cam, RenderConfig(chunk=64))
    assert rep["visible"] > 0
    assert rep["num_pairs"] >= rep["visible"]
    assert 0 < rep["nonzero_pixel_frac"] <= 1
    assert rep["overflow"] == 0


def test_pair_stats_suggestion():
    import splat_tpu as st

    scene = st.random_scene(512, seed=7, extent=2.0,
                            scale_range=(0.02, 0.12))
    cam = st.Camera.create(h=96, w=128, position=(0.0, 0.0, 4.0))
    stats = st.pair_stats(scene, cam)
    assert 0 < stats["visible"] <= 512
    assert stats["num_pairs"] >= stats["visible"]
    assert stats["suggested_dup_factor"] >= 1.25
    # the suggestion must actually fit the measured load
    assert (stats["suggested_dup_factor"] * 512 >= stats["num_pairs"])


def test_png_roundtrip_levels_and_rgba(tmp_path):
    """encode_png/write_png/read_png: exact u8 round-trip for RGB and
    RGBA at both the archival level and the stored-block (level 0)
    serving path the viewer uses."""
    import numpy as np

    from splat_tpu.utils.image import encode_png, read_png, write_png

    rng = np.random.default_rng(3)
    for c in (3, 4):
        img = rng.integers(0, 256, size=(24, 40, c), dtype=np.uint8)
        for level in (0, 6):
            p = str(tmp_path / f"t{c}_{level}.png")
            write_png(p, img, level=level)
            back = read_png(p)
            assert back.shape == (24, 40, c)
            np.testing.assert_array_equal(back, img)
            # bytes API agrees with the file API
            assert open(p, "rb").read() == encode_png(img, level=level)
