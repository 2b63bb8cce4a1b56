"""Mask-lifting + find-&-match segmentation tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wheat3dgs_tpu import testing
from wheat3dgs_tpu.ops import mask_lift
from wheat3dgs_tpu.ops.reference_raster import composite_pixels
from wheat3dgs_tpu.seg.pipeline import reset_label


def test_lift_mask_matches_naive_weights():
    """used_count[l, i] must equal the naive per-pixel blending weights
    summed over pixels with label l."""
    cam = testing.look_at_camera(width=64, height=48)
    g = testing.random_gaussians(n=80, seed=4, spread=0.7)
    s = testing.project_scene(g, cam, use_colors=True)

    rng = np.random.default_rng(0)
    gt_mask = rng.integers(0, 3, size=(48, 64)).astype(np.int32)  # labels 0-2

    out = mask_lift.lift_mask(s, jnp.asarray(gt_mask), num_obj=2,
                              width=64, height=48, max_tiles_per_gauss=32,
                              max_per_tile=128, tile_batch=4)
    got = np.asarray(out.used_count)

    ys, xs = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    pix = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], 1), jnp.float32)
    ref = composite_pixels(pix, s, jnp.zeros(3), tile_grid=(4, 3, 16))
    w = np.asarray(ref["weights"])                 # (P, N) in sorted order
    order = np.asarray(ref["order"])
    want = np.zeros_like(got)
    labels_flat = gt_mask.ravel()
    for l in range(3):
        want[l, order] = w[labels_flat == l].sum(axis=0)
    np.testing.assert_allclose(got, want, atol=1e-4)

    # API parity tail (gaussian_renderer/__init__.py:203-204): per-Gaussian
    # projected pixel center + view depth ride the LiftOut.
    np.testing.assert_allclose(np.asarray(out.proj_xy), np.asarray(s.xy))
    np.testing.assert_allclose(np.asarray(out.gs_depth), np.asarray(s.depth))
    # alpha image agrees with weight sums
    np.testing.assert_allclose(np.asarray(out.alpha).ravel(),
                               w.sum(axis=1), atol=1e-5)


def test_multi_instance_opt_matches_reference_loop():
    """Vectorized assignment == the reference's per-object normalize+argmax."""
    rng = np.random.default_rng(1)
    counts = rng.uniform(0, 5, size=(4, 50)).astype(np.float32)
    counts[:, :10] = 0.0
    got = np.asarray(mask_lift.multi_instance_opt(jnp.asarray(counts), 0.1))

    total = counts.sum(0)
    want = np.zeros_like(counts, bool)
    for l in range(4):
        own = counts[l]
        rest = total - own
        stack = np.stack([rest, own])
        nrm = np.linalg.norm(stack, axis=0)
        nrm[nrm == 0] = 1.0
        stack = stack / nrm
        stack[0] += 0.1
        want[l] = np.argmax(stack, axis=0).astype(bool)
    np.testing.assert_array_equal(got, want)


def test_reset_label_semantics():
    inst = np.zeros(20, np.int32)
    inst[:8] = 1                     # head 1 owns slots 0-7
    # case A: new head mostly overlaps old -> merged into old id
    new_mask = np.zeros(20, bool)
    new_mask[:8] = True              # 8/8 overlap, intersect 8/8 >= 0.6
    out, which = reset_label(inst, new_mask, set_which_object_to=2)
    assert which == 1 and (out[new_mask] == 1).all()
    # case B: disjoint -> new id
    new_mask = np.zeros(20, bool)
    new_mask[10:15] = True
    out, which = reset_label(inst, new_mask, set_which_object_to=2)
    assert which is None and (out[10:15] == 2).all()
    # case C: high overlap ratio but small intersect w.r.t. new -> new id
    inst2 = np.zeros(20, np.int32)
    inst2[0:2] = 1
    new_mask = np.zeros(20, bool)
    new_mask[0:2] = True
    new_mask[2:10] = True            # 2/10 nonzero = 0.2 < 0.8 -> new id
    out, which = reset_label(inst2, new_mask, set_which_object_to=2)
    assert which is None and (out[new_mask] == 2).all()


def _tiny_state_and_cam(n=60, width=64, height=48, seed=7, capacity=64):
    from wheat3dgs_tpu.models import gaussians as G

    g = testing.random_gaussians(n=n, seed=seed, spread=0.7)
    o = np.clip(g["opacities"], 1e-4, 1 - 1e-4)
    params = G.GaussianParams(
        means=jnp.asarray(g["means3d"]),
        quats=jnp.asarray(g["quats"]),
        log_scales=jnp.asarray(np.log(g["scales"])),
        sh_dc=jnp.asarray(g["colors"]),
        sh_rest=jnp.zeros((n, 0), jnp.float32),
        opacity_logit=jnp.asarray(np.log(o / (1 - o))))
    state = G.init_state(params, capacity=capacity)
    cam = testing.look_at_camera(width=width, height=height)
    cams = (jnp.asarray(cam.w2c), jnp.asarray(cam.full_proj),
            jnp.asarray(cam.cam_center), jnp.float32(cam.tanfovx),
            jnp.float32(cam.tanfovy))
    return state, cams


def test_lift_batch8_matches_lift_view():
    """The VJP-through-colors batched lift == the per-mask label-image lift."""
    from wheat3dgs_tpu.render.pipeline import RasterConfig
    from wheat3dgs_tpu.seg import flashsplat

    w, h = 64, 48
    state, cams = _tiny_state_and_cam(width=w, height=h)
    conf = RasterConfig(max_tiles_per_gauss=32, max_per_tile=128,
                        tile_batch=4)
    rng = np.random.default_rng(3)
    masks = rng.random((8, h, w)) < 0.3          # 7 random masks + ones row
    masks[7] = True
    bits8 = np.stack([np.packbits(m, axis=None) for m in masks])

    got = np.asarray(flashsplat.lift_batch8(
        state, *cams, jnp.asarray(bits8), width=w, height=h, config=conf))

    for m in range(8):
        ref = flashsplat.lift_view(
            state, *cams, jnp.asarray(masks[m], jnp.int32), num_obj=1,
            width=w, height=h, config=conf)
        np.testing.assert_allclose(got[m], np.asarray(ref.used_count)[1],
                                   atol=1e-3, rtol=1e-4)


@pytest.mark.slow
def test_lift_batch8_pallas_backend_parity():
    """Same VJP lift through the Pallas custom_vjp (interpret mode) — the
    path the TPU envelope run takes (bf16 reduction => loose tolerance)."""
    from wheat3dgs_tpu.render.pipeline import RasterConfig
    from wheat3dgs_tpu.seg import flashsplat

    w, h = 64, 48
    state, cams = _tiny_state_and_cam(width=w, height=h)
    xla = RasterConfig(max_tiles_per_gauss=32, max_per_tile=128,
                       tile_batch=4)
    pal = RasterConfig(backend="pallas", entry_budget=2048)
    rng = np.random.default_rng(3)
    masks = rng.random((8, h, w)) < 0.3
    masks[7] = True
    bits8 = jnp.asarray(
        np.stack([np.packbits(m, axis=None) for m in masks]))

    got = np.asarray(flashsplat.lift_batch8(
        state, *cams, bits8, width=w, height=h, config=pal))
    want = np.asarray(flashsplat.lift_batch8(
        state, *cams, bits8, width=w, height=h, config=xla))
    # bf16 per-entry rounding in the Pallas gradient reduction: ~0.4% rel.
    np.testing.assert_allclose(got, want, atol=5e-3,
                               rtol=2e-2)


def test_match_views_packed_parity():
    """Device-side packed matching == host thresholds/bboxes/IoUs."""
    from wheat3dgs_tpu.render.pipeline import RasterConfig
    from wheat3dgs_tpu.seg import flashsplat
    from wheat3dgs_tpu.utils import image_ops

    w, h = 64, 48
    state, cams = _tiny_state_and_cam(width=w, height=h)
    # A 2-view camera "batch" (same camera twice is fine for parity).
    cams_b = tuple(jnp.stack([c, c]) for c in cams)
    conf = RasterConfig(max_tiles_per_gauss=32, max_per_tile=128,
                        tile_batch=4)
    rng = np.random.default_rng(5)
    counts = jnp.asarray(rng.uniform(0, 2, (2, state.capacity)),
                         jnp.float32)
    m_masks = rng.random((2, 3, h, w)) < 0.25     # (B=2, M=3) SAM masks
    bits = np.stack([[np.packbits(mm, axis=None) for mm in view]
                     for view in m_masks])

    used, inter, area, bbox, _ = flashsplat.match_views_packed(
        state, *cams_b, counts, jnp.asarray(bits), width=w, height=h,
        config=conf)
    used = np.asarray(used)

    want_used = np.asarray(mask_lift.multi_instance_opt(counts))[1]
    np.testing.assert_array_equal(used, want_used)

    alphas = np.asarray(flashsplat.alpha_views(
        state, *cams_b, jnp.asarray(used), width=w, height=h, config=conf))
    for v in range(2):
        pred = alphas[v] > 0.5
        assert int(np.asarray(area)[v]) == int(pred.sum())
        if pred.sum():
            assert tuple(np.asarray(bbox)[v]) == \
                image_ops.get_bbox_from_mask(pred)
        for k in range(3):
            want_inter = int(np.logical_and(pred, m_masks[v, k]).sum())
            assert int(np.asarray(inter)[v, k]) == want_inter


def test_predbits_views_roundtrip():
    from wheat3dgs_tpu.render.pipeline import RasterConfig
    from wheat3dgs_tpu.seg import flashsplat

    w, h = 64, 48
    state, cams = _tiny_state_and_cam(width=w, height=h)
    cams_b = tuple(jnp.stack([c]) for c in cams)
    conf = RasterConfig(max_tiles_per_gauss=32, max_per_tile=128,
                        tile_batch=4)
    used = jnp.ones((state.capacity,), bool)
    bits, _ = flashsplat.predbits_views(
        state, *cams_b, used, width=w, height=h, config=conf)
    pred = np.unpackbits(np.asarray(bits)[0], count=h * w).astype(
        bool).reshape(h, w)
    alphas = np.asarray(flashsplat.alpha_views(
        state, *cams_b, used, width=w, height=h, config=conf))
    np.testing.assert_array_equal(pred, alphas[0] > 0.5)


@pytest.fixture(scope="module")
def trained_scene(tmp_path_factory):
    """Synthetic scene + quick-trained model for the seg pipeline."""
    from wheat3dgs_tpu.apps.train_vanilla import main as train_main
    from wheat3dgs_tpu.io.synthetic import make_synthetic_colmap_scene

    scene_dir = str(tmp_path_factory.mktemp("segscene"))
    model_dir = str(tmp_path_factory.mktemp("segmodel"))
    make_synthetic_colmap_scene(scene_dir, width=96, height=72, n_heads=3,
                                pts_per_head=100, ground_pts=500, seed=3)
    train_main(["-s", scene_dir, "-m", model_dir, "--iterations", "150",
                "--densify_from_iter", "1000", "--test_iterations", "-1",
                "--save_iterations", "150", "--max_per_tile", "128",
                "--sh_degree", "1", "--quiet"])
    return scene_dir, model_dir


@pytest.mark.slow
def test_run_3d_seg_end_to_end(trained_scene):
    from wheat3dgs_tpu.apps.run_3d_seg_app import main as seg_main

    scene_dir, model_dir = trained_scene
    summary = seg_main(["-s", scene_dir, "-m", model_dir,
                        "--exp_name", "t", "--iou_threshold", "0.4",
                        "--max_per_tile", "128", "--quiet"])
    # The synthetic scene has 3 heads; pipeline should find most of them
    # and must not exceed the count wildly.
    assert 2 <= summary["num_heads"] <= 4
    base = summary["out_dir"]
    plys = os.listdir(os.path.join(base, "ply"))
    assert len(plys) >= 2
    assert os.path.exists(os.path.join(base, "results.csv"))
    assert os.path.exists(os.path.join(base, "gaussians.ply"))
    segs = os.listdir(os.path.join(base, "2DSeg"))
    assert len(segs) == 12           # 10 train + 2 test views
    # 2DSeg maps contain the found head ids
    from wheat3dgs_tpu.seg.pipeline import load_pt

    ids = set()
    for f in segs:
        ids |= set(np.unique(load_pt(os.path.join(base, "2DSeg", f))))
    assert len(ids - {0}) == summary["num_heads"]


def test_eval_obj_labels_depth_resolution():
    """Two heads occluding each other: the nearer one wins contested pixels."""
    from wheat3dgs_tpu.models import gaussians as G
    from wheat3dgs_tpu.render.pipeline import RasterConfig
    from wheat3dgs_tpu.seg.eval import eval_obj_labels

    cam = testing.look_at_camera(width=32, height=32)
    # head 1 at z=0 (near, cam at z=-4), head 2 at z=+1 (far), same x/y.
    means = np.array([[0, 0, 0], [0, 0, 1.0]], np.float32)
    params = G.GaussianParams(
        means=jnp.asarray(means),
        quats=jnp.zeros((2, 4), jnp.float32).at[:, 0].set(1.0),
        log_scales=jnp.full((2, 3), np.log(0.2), jnp.float32),
        sh_dc=jnp.zeros((2, 3), jnp.float32),
        sh_rest=jnp.zeros((2, 0), jnp.float32),
        opacity_logit=jnp.full((2,), 8.0, jnp.float32))
    state = G.init_state(params, capacity=8)
    labels = np.zeros((3, 8), bool)
    labels[1, 1] = True   # head 1 = far gaussian
    labels[2, 0] = True   # head 2 = near gaussian
    conf = RasterConfig(max_tiles_per_gauss=8, max_per_tile=16, tile_batch=4)
    cams = (jnp.asarray(cam.w2c), jnp.asarray(cam.full_proj),
            jnp.asarray(cam.cam_center), jnp.float32(cam.tanfovx),
            jnp.float32(cam.tanfovy))
    pred = np.asarray(eval_obj_labels(state, jnp.asarray(labels), *cams,
                                      width=32, height=32, config=conf,
                                      head_batch=2))
    center = pred[16, 16]
    assert center == 2, pred[14:18, 14:18]   # near head claims the center


@pytest.mark.slow
def test_run_segmentation_resume(trained_scene, tmp_path):
    """A run interrupted at a consistent checkpoint and resumed produces the
    same head ids and 2DSeg maps as an uninterrupted run (loop-state
    checkpointing, SURVEY §5.3 failure recovery)."""
    from wheat3dgs_tpu import config as cfg
    from wheat3dgs_tpu.render.pipeline import (RasterConfig, adapt_config,
                                               inference_config)
    from wheat3dgs_tpu.scene import Scene
    from wheat3dgs_tpu.apps.run_3d_seg_app import build_context
    from wheat3dgs_tpu.seg.pipeline import load_pt, run_segmentation

    scene_dir, model_dir = trained_scene
    model = cfg.ModelParams(source_path=scene_dir, model_path=model_dir,
                            eval=True, resolution=1)
    scene = Scene(model, load_iteration=-1, shuffle=False)
    w0, h0 = scene.image_size
    n_train = len(scene.data.train.metas)
    config = adapt_config(
        scene.gaussians, scene.cam_arrays("train", 0), w0, h0,
        inference_config(RasterConfig(max_per_tile=128)),
        cams=[scene.cam_arrays("train", i) for i in range(n_train)])

    ctx_a = build_context(scene, config)
    full = run_segmentation(ctx_a, str(tmp_path / "full"), "r",
                            iou_threshold=0.4, verbose=False)

    ctx_b = build_context(scene, config)
    part = run_segmentation(ctx_b, str(tmp_path / "resumed"), "r",
                            iou_threshold=0.4, verbose=False,
                            _stop_after_masks=12)
    assert "interrupted_at" in part
    ctx_c = build_context(scene, config)
    res = run_segmentation(ctx_c, str(tmp_path / "resumed"), "r",
                           iou_threshold=0.4, verbose=False)

    assert res["num_heads"] == full["num_heads"]
    ids = lambda d: sorted(f[3:-4].split("_")[0] for f in os.listdir(
        os.path.join(d, "ply")))
    # Base numeric ids must agree (letter re-saves may differ by replay).
    assert sorted(set(ids(full["out_dir"]))) == sorted(set(
        ids(res["out_dir"])))
    for name in list(res["seg_maps"]):
        a = load_pt(os.path.join(full["out_dir"], "2DSeg", f"{name}.pt"))
        b = load_pt(os.path.join(res["out_dir"], "2DSeg", f"{name}.pt"))
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_eval_wheatgs_and_render_360(trained_scene, tmp_path):
    """eval_wheatgs + render_360 field/head run after run_3d_seg artifacts."""
    from wheat3dgs_tpu.apps.run_3d_seg_app import main as seg_main
    from wheat3dgs_tpu.apps.eval_wheatgs_app import main as eval_main
    from wheat3dgs_tpu.apps.render_360_app import main as r360_main

    scene_dir, model_dir = trained_scene
    seg_main(["-s", scene_dir, "-m", model_dir, "--exp_name", "e2",
              "--iou_threshold", "0.4", "--max_per_tile", "128", "--quiet"])
    eval_main(["-s", scene_dir, "-m", model_dir, "--exp_name", "e2"])
    seg_png = os.path.join(model_dir, "test", "segmentation")
    overlay_png = os.path.join(model_dir, "test", "overlay")
    assert len(os.listdir(seg_png)) == 2
    assert len(os.listdir(overlay_png)) == 2
    assert os.path.exists(os.path.join(model_dir, "wheat-head", "e2",
                                       "all_counts.pt"))

    r360_main(["-s", scene_dir, "-m", model_dir, "--exp_name", "e2",
               "--render_type", "field", "--n_frames", "6",
               "--framerate", "5"])
    assert os.path.exists(os.path.join(model_dir, "wheat-head", "e2",
                                       "wheat_field_360.mp4"))
    r360_main(["-s", scene_dir, "-m", model_dir, "--exp_name", "e2",
               "--render_type", "head", "--n_frames", "4",
               "--framerate", "5"])
    out360 = os.path.join(model_dir, "wheat-head", "e2", "wheat_head_360")
    assert len([f for f in os.listdir(out360) if f.endswith(".mp4")]) >= 2


@pytest.fixture(scope="module")
def adjacent_scene(tmp_path_factory):
    """Three near-touching heads in a row: the same physical head is hit by
    masks from many views, so find-&-match + reset_label must MERGE repeat
    discoveries instead of minting duplicate ids, and adjacency must not
    fuse distinct heads (VERDICT r2 item 3 regression fixture)."""
    from wheat3dgs_tpu.apps.train_vanilla import main as train_main
    from wheat3dgs_tpu.io.synthetic import make_synthetic_colmap_scene

    scene_dir = str(tmp_path_factory.mktemp("adjscene"))
    model_dir = str(tmp_path_factory.mktemp("adjmodel"))
    make_synthetic_colmap_scene(
        scene_dir, width=96, height=72, n_heads=3, pts_per_head=110,
        ground_pts=500, seed=5,
        head_centers=[(-0.16, 0.0), (0.0, 0.0), (0.16, 0.0)])
    train_main(["-s", scene_dir, "-m", model_dir, "--iterations", "150",
                "--densify_from_iter", "1000", "--test_iterations", "-1",
                "--save_iterations", "150", "--max_per_tile", "128",
                "--sh_degree", "1", "--quiet"])
    return scene_dir, model_dir


@pytest.mark.slow
def test_adjacent_heads_merge_no_duplicates(adjacent_scene):
    from wheat3dgs_tpu.apps.run_3d_seg_app import main as seg_main
    from wheat3dgs_tpu.io.ply import read_ply

    scene_dir, model_dir = adjacent_scene
    summary = seg_main(["-s", scene_dir, "-m", model_dir,
                        "--exp_name", "adj", "--iou_threshold", "0.4",
                        "--max_per_tile", "128", "--quiet"])
    base = summary["out_dir"]
    # Adjacency must neither fuse the three heads into fewer ids nor let
    # repeat discoveries escape the merge path as extra ids.
    assert summary["num_heads"] == 3, summary
    plys = sorted(f for f in os.listdir(os.path.join(base, "ply"))
                  if f.startswith("wh_"))
    # Exactly 3 DISTINCT head ids. Letter-suffixed re-saves (wh_0001_a) are
    # the reference's own merge artifact (find_new_mask_dir,
    # run_3d_seg.py:33-46): a repeat discovery that reset_label correctly
    # folded into an existing id. What must never happen is a 4th id
    # (duplicate escaping the merge) or fewer than 3 (adjacent heads fused).
    ids = sorted({f[3:-4].split("_")[0] for f in plys})
    assert ids == ["0001", "0002", "0003"], plys
    # The three heads are spatially distinct: centroids of the base saves
    # must be separated along the placement axis.
    cxs = []
    for hid in ids:
        d = read_ply(os.path.join(base, "ply", f"wh_{hid}.ply"))
        cxs.append(float(np.mean(d["x"])))
    cxs = sorted(cxs)
    assert cxs[1] - cxs[0] > 0.05 and cxs[2] - cxs[1] > 0.05, cxs
