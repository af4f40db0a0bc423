import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_master_tpu.models import (
    backbone as backbone_mod,
    frontend as frontend_mod,
    refiner as refiner_mod,
    segmenter as segmenter_mod,
    selector as selector_mod,
    uncertainty as uncertainty_mod,
)

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject markers)


@pytest.fixture(scope="module")
def tiny_vit():
    model = backbone_mod.ViTBackbone(
        embed_dim=64, depth=2, num_heads=2, patch_size=16, dtype=jnp.float32
    )
    imgs = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    return model, variables


def test_vit_output_grid(tiny_vit):
    model, variables = tiny_vit
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    out = model.apply(variables, imgs)
    assert out.shape == (2, 4, 4, 64)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_vit_batchnorm_train_updates_stats(tiny_vit):
    model, variables = tiny_vit
    imgs = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64, 64, 3)), jnp.float32)
    out, mutated = model.apply(variables, imgs, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["feature_norm"]["mean"]
    after = mutated["batch_stats"]["feature_norm"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_patch_pixel_converters():
    patch = jnp.asarray([[0.0, 0.0], [27.0, 27.0]])
    px = backbone_mod.patch_to_pixel(patch)
    assert np.allclose(np.asarray(px), [[8.0, 8.0], [27 * 16 + 8.0, 27 * 16 + 8.0]])
    assert np.allclose(np.asarray(backbone_mod.pixel_to_patch(px)), np.asarray(patch))


def test_selector_output_range():
    model = selector_mod.KeypointSelector(hidden_dim=16)
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 32)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats)
    sal = model.apply(variables, feats)
    assert sal.shape == (2, 8, 8, 1)
    s = np.asarray(sal)
    assert s.min() >= 0.0 and s.max() <= 1.0


def test_select_keypoints_fixed_k_and_ordering():
    rng = np.random.default_rng(0)
    sal = rng.uniform(0.0, 0.4, size=(1, 28, 28)).astype(np.float32)
    # plant 5 strong isolated peaks
    peaks = [(4, 4), (10, 20), (20, 8), (24, 24), (14, 3)]
    for y, x in peaks:
        sal[0, y, x] = 0.9
    kp = selector_mod.select_keypoints(jnp.asarray(sal), num_keypoints=50)
    assert kp.xy.shape == (1, 50, 2)
    # the 5 peaks must be the first 5 selections
    first5 = {tuple(v) for v in np.asarray(kp.xy)[0, :5].astype(int)}
    assert first5 == {(x, y) for y, x in peaks}


def test_select_keypoints_low_saliency_fallback():
    """All saliency below the 0.1 floor: raw top-k fallback still returns
    exactly K keypoints (reference cascade last resort, :174-184)."""
    sal = jnp.full((1, 28, 28), 0.01)
    kp = selector_mod.select_keypoints(sal, num_keypoints=100)
    assert kp.xy.shape == (1, 100, 2)
    assert np.asarray(kp.valid).all()


def test_refiner_unit_norm():
    model = refiner_mod.DescriptorRefiner(hidden_dim=64, output_dim=32, num_layers=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 48)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    d = model.apply(variables, x)
    assert d.shape == (2, 10, 32)
    norms = np.linalg.norm(np.asarray(d), axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_refiner_no_collapse():
    """Orthogonal init: descriptors of distinct inputs must differ."""
    model = refiner_mod.DescriptorRefiner(hidden_dim=64, output_dim=32, num_layers=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 100, 48)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    d = np.asarray(model.apply(variables, x))[0]
    var_per_dim = d.var(axis=0).mean()
    assert var_per_dim > 0.005  # reference's collapse threshold (train.py:537)


def test_uncertainty_head_and_losses():
    model = uncertainty_mod.UncertaintyEstimator(hidden_dim=32)
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, 20, 48)), jnp.float32)
    desc = jnp.asarray(np.random.default_rng(1).normal(size=(2, 20, 16)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats, desc)
    conf = model.apply(variables, feats, desc)
    assert conf.shape == (2, 20, 1)
    assert 0.0 <= float(conf.min()) and float(conf.max()) <= 1.0

    err = jnp.asarray(np.random.default_rng(2).uniform(0, 5, size=(2, 20)), jnp.float32)
    l1 = uncertainty_mod.calibration_loss(conf, err)
    l2 = uncertainty_mod.expected_error_loss(conf, err)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))

    mask = uncertainty_mod.confidence_mask(conf, threshold=2.0)  # impossible thr
    assert np.asarray(mask).sum(axis=-1).min() == 1  # keeps at least one


def test_segmenter_shapes_and_loss():
    model = segmenter_mod.SemanticSegmenter(width=8)
    rgb = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 80, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), rgb)
    logits = model.apply(variables, rgb)
    assert logits.shape == (2, 64, 80, segmenter_mod.NUM_CLASSES)

    labels = jnp.zeros((2, 64, 80), jnp.int32)
    loss = segmenter_mod.segmentation_loss(logits, labels)
    assert np.isfinite(float(loss))

    weights = segmenter_mod.keypoint_semantic_weights(
        logits, jnp.asarray([[[5.0, 5.0], [20.0, 30.0]]] * 2)
    )
    assert weights.shape == (2, 2)


def test_semantic_weights_downweight_person():
    labels = jnp.full((1, 10, 10), segmenter_mod.CLASS_NAMES.index("person"), jnp.int32)
    w = segmenter_mod.keypoint_semantic_weights(labels, jnp.asarray([[[4.0, 4.0]]]))
    assert np.isclose(float(w[0, 0]), segmenter_mod.DEFAULT_CLASS_WEIGHTS[4])


def test_segmenter_low_res_production_path():
    """full_res=False logits are the pre-upsample decoder output: same
    params, 1/4 spatial dims, and keypoint weights sampled off the
    low-res map (via image_size rescaling) agree with full-res sampling
    away from label boundaries."""
    model = segmenter_mod.SemanticSegmenter(width=8)
    rgb = jnp.asarray(
        np.random.default_rng(3).uniform(size=(1, 64, 80, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), rgb)
    lo = model.apply(variables, rgb, full_res=False)
    hi = model.apply(variables, rgb)
    assert lo.shape == (1, 16, 20, segmenter_mod.NUM_CLASSES)
    assert hi.shape == (1, 64, 80, segmenter_mod.NUM_CLASSES)
    # The full-res logits are exactly the bilinear upsample of the
    # low-res ones (the upsample is param-free).
    import jax as _jax

    up = _jax.image.resize(lo, hi.shape, method="bilinear")
    np.testing.assert_allclose(np.asarray(up), np.asarray(hi), atol=1e-5)

    # Weight sampling: low-res LABELS + image_size rescaling must agree
    # with nearest-upsampled full-res labels at every full-res pixel
    # (exact nearest-neighbor semantics, no interpolation ambiguity).
    labels_lo = jnp.asarray(
        np.random.default_rng(4).integers(0, 6, size=(1, 16, 20)), jnp.int32
    )
    labels_hi = jnp.repeat(jnp.repeat(labels_lo, 4, axis=1), 4, axis=2)
    xs, ys = np.meshgrid(np.arange(80), np.arange(64))
    xy = jnp.asarray(
        np.stack([xs.ravel(), ys.ravel()], -1)[None], jnp.float32
    )
    w_lo = segmenter_mod.keypoint_semantic_weights(
        labels_lo, xy, image_size=(64, 80)
    )
    w_hi = segmenter_mod.keypoint_semantic_weights(labels_hi, xy)
    np.testing.assert_allclose(np.asarray(w_lo), np.asarray(w_hi))


def test_extract_features_low_res_weight_map():
    """extract_features samples a low-res weight map with pixel-center
    aligned coordinate rescaling — a map block's weight lands on every
    keypoint inside the corresponding full-res region."""
    from semantic_slam_master_tpu.slam import tracking

    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(size=(1, 96, 128)), jnp.float32)
    depth = jnp.ones((1, 96, 128), jnp.float32)
    # 1/4-res map: left half weight 0.05, right half 1.0.
    wmap = np.ones((1, 24, 32), np.float32)
    wmap[:, :, :16] = 0.05
    feats = tracking.extract_features(
        gray, depth, num_keypoints=64, weight_map=jnp.asarray(wmap),
        num_levels=1,
    )
    xy = np.asarray(feats.xy[0])
    sw = np.asarray(feats.sem_weight[0])
    valid = np.asarray(feats.valid[0])
    # Keypoints clearly inside each half (away from the 4-px boundary
    # column) must carry that half's weight.
    left = valid & (xy[:, 0] < 60)
    right = valid & (xy[:, 0] > 68)
    assert left.any() and right.any()
    assert np.allclose(sw[left], 0.05)
    assert np.allclose(sw[right], 1.0)


def test_frontend_end_to_end():
    model = frontend_mod.tiny_frontend()
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(variables, imgs)
    assert out.keypoints_px.shape == (2, 64, 2)
    assert out.descriptors.shape == (2, 64, 32)
    assert out.saliency.shape == (2, 4, 4, 1)
    assert np.allclose(np.linalg.norm(np.asarray(out.descriptors), axis=-1), 1.0, atol=1e-5)
    assert np.all(np.isfinite(np.asarray(out.confidence)))
    # pixel coords inside the image
    px = np.asarray(out.keypoints_px)
    assert px.min() >= 0 and px.max() <= 64


def test_frontend_jit():
    model = frontend_mod.tiny_frontend()
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), imgs)
    f = jax.jit(lambda v, x: model.apply(v, x))
    out = f(variables, imgs)
    assert out.descriptors.shape == (1, 64, 32)


def test_refine_keypoints_moves_toward_offset_peak():
    """A saliency ridge between two patches pulls the soft-argmax toward
    the neighbor; an isolated peak stays put; borders stay in-grid."""
    from semantic_slam_master_tpu.models.selector import refine_keypoints

    H = W = 8
    sal = np.full((1, H, W), 0.1, np.float32)
    # isolated peak at (2, 2)
    sal[0, 2, 2] = 0.9
    # split peak: (5, 5) strong, (5, 6) nearly as strong -> pulls +x
    sal[0, 5, 5] = 0.9
    sal[0, 5, 6] = 0.8
    xy = jnp.asarray([[[2.0, 2.0], [5.0, 5.0], [0.0, 0.0]]])
    ref = np.asarray(refine_keypoints(jnp.asarray(sal), xy))
    assert np.allclose(ref[0, 0], [2.0, 2.0], atol=0.05)  # isolated: stays
    assert ref[0, 1, 0] > 5.05 and ref[0, 1, 0] < 6.0  # pulled toward x=6
    assert abs(ref[0, 1, 1] - 5.0) < 0.05  # not in y
    assert ref[0, 2, 0] >= 0.0 and ref[0, 2, 1] >= 0.0  # border clamped


def test_offset_head_zero_init_and_bounded():
    """refine_at starts exactly at patch centers (zero-init head) and
    offsets stay within +/- max_offset patches after perturbation."""
    import jax
    from semantic_slam_master_tpu.models.frontend import tiny_frontend, LearnedFrontend

    model = tiny_frontend(subpatch_refine=True)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), imgs)

    out = model.apply(variables, imgs)
    feats, sal = model.apply(
        variables, imgs, method=LearnedFrontend.features_and_saliency
    )
    from semantic_slam_master_tpu.models.selector import select_keypoints

    kp = select_keypoints(sal, model.num_keypoints)
    refined = model.apply(
        variables, feats, sal, imgs, kp.xy, method=LearnedFrontend.refine_at
    )
    # zero-init final layer -> offsets exactly zero at init
    assert np.allclose(np.asarray(refined), np.asarray(kp.xy))

    # perturb the head's output kernel -> nonzero but bounded offsets
    import flax

    params = flax.core.unfreeze(variables["params"])
    leaf = params["offset_head"]["Conv_2"]
    leaf["kernel"] = jnp.ones_like(leaf["kernel"]) * 0.5
    leaf["bias"] = jnp.ones_like(leaf["bias"]) * 0.3
    v2 = {**variables, "params": flax.core.freeze(params)}
    refined2 = model.apply(
        v2, feats, sal, imgs, kp.xy, method=LearnedFrontend.refine_at
    )
    d = np.abs(np.asarray(refined2) - np.asarray(kp.xy))
    assert d.max() > 1e-4
    assert d.max() <= 1.0 + 1e-6
