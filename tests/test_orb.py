import jax.numpy as jnp
import numpy as np

from semantic_slam_master_tpu.ops import fast, image, orb, matching


def test_pattern_deterministic():
    p1 = orb.make_test_pattern()
    p2 = orb.make_test_pattern()
    assert np.array_equal(p1, p2)
    assert p1.shape == (256, 4)
    # all points inside the patch
    assert np.abs(p1).max() <= orb.PATCH_RADIUS


def test_orientation_of_gradient():
    """Intensity increasing along +x must give orientation ~0; along +y ~pi/2."""
    H = W = 64
    xs = np.tile(np.linspace(0, 1, W, dtype=np.float32), (H, 1))
    img_x = jnp.asarray(xs)[None]
    img_y = jnp.asarray(xs.T)[None]
    center = jnp.asarray([[[32.0, 32.0]]])
    th_x = float(orb.orientations(img_x, center)[0, 0])
    th_y = float(orb.orientations(img_y, center)[0, 0])
    assert abs(th_x) < 0.05
    assert abs(th_y - np.pi / 2) < 0.05


def test_descriptor_packing_shape():
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64)).astype(np.float32))
    xy = jnp.asarray(np.random.default_rng(1).uniform(20, 44, size=(2, 10, 2)).astype(np.float32))
    desc = orb.describe(img, xy)
    assert desc.shape == (2, 10, 8)
    assert desc.dtype == jnp.uint32
    bits = orb.unpack_bits(desc)
    assert bits.shape == (2, 10, 256)
    signs = orb.to_signs(desc)
    assert set(np.unique(np.asarray(signs, dtype=np.float32))) <= {-1.0, 1.0}


def test_descriptor_rotation_invariance(rng):
    """Rotating an image patch by ~20 deg must keep Hamming distance of the
    steered descriptor small (rBRIEF's purpose)."""
    # Build a textured image, rotate it about its center.
    from scipy.ndimage import rotate as nd_rotate  # scipy is available w/ jax

    tex = rng.uniform(size=(96, 96)).astype(np.float32)
    tex = np.asarray(image.gaussian_blur(jnp.asarray(tex)[None], 1.5, 3))[0]
    angle_deg = 20.0
    rot = nd_rotate(tex, -angle_deg, reshape=False, order=1, mode="nearest")

    center = jnp.asarray([[[48.0, 48.0]]])
    d1 = orb.describe(jnp.asarray(tex)[None], center)
    d2 = orb.describe(jnp.asarray(rot)[None], center)
    dist_rot = float(matching.hamming_distance_matrix(d1, d2)[0, 0, 0])

    # Distance to a random other location should be much larger.
    other = jnp.asarray([[[30.0, 60.0]]])
    d3 = orb.describe(jnp.asarray(tex)[None], other)
    dist_rand = float(matching.hamming_distance_matrix(d1, d3)[0, 0, 0])
    assert dist_rot < 60, dist_rot
    assert dist_rot < dist_rand


def test_end_to_end_detect_describe_match():
    """Two renders of the same scene, small motion: ORB matches must be
    abundant and geometrically consistent."""
    from semantic_slam_master_tpu.data import synthetic

    # The arc spans the whole sequence: 20 frames makes adjacent-frame
    # motion genuinely small (~2 px), which the coherent-median-flow
    # assertion below assumes (at 6 frames the motion is ~13 px with
    # parallax, where a single median displacement is the wrong model).
    seq = synthetic.make_sequence(num_frames=20, scale=0.5)
    f0, f1 = seq.frame(0), seq.frame(1)
    g0 = image.rgb_to_gray(jnp.asarray(f0["rgb"])[None])
    g1 = image.rgb_to_gray(jnp.asarray(f1["rgb"])[None])

    kp0 = fast.detect(g0, 300, threshold=0.05)
    kp1 = fast.detect(g1, 300, threshold=0.05)
    d0 = orb.describe(g0, kp0.xy)
    d1 = orb.describe(g1, kp1.xy)
    m = matching.match_hamming(d0, d1, kp0.valid, kp1.valid, max_distance=64.0)
    n_matches = int(m.count()[0])
    assert n_matches > 60, n_matches

    # Geometric consistency: matched displacement should be small and
    # consistent (1-frame motion), with few outliers.
    valid = np.asarray(m.valid[0])
    xy0 = np.asarray(kp0.xy[0])[valid]
    xy1 = np.asarray(kp1.xy[0])[np.asarray(m.idx2[0])[valid]]
    disp = xy1 - xy0
    med = np.median(disp, axis=0)
    # Coherent flow: most matches move with the median displacement.
    inlier = np.linalg.norm(disp - med, axis=1) < 5.0
    assert inlier.mean() > 0.7, inlier.mean()


def test_hamming_matmul_equals_popcount(rng):
    a = rng.integers(0, 2**32, size=(1, 20, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(1, 30, 8), dtype=np.uint32)
    ours = np.asarray(matching.hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b)))[0]
    # numpy popcount reference
    abits = np.unpackbits(a.view(np.uint8), axis=-1, bitorder="little").reshape(20, 256)
    bbits = np.unpackbits(b.view(np.uint8), axis=-1, bitorder="little").reshape(30, 256)
    ref = (abits[:, None, :] != bbits[None, :, :]).sum(-1)
    assert np.array_equal(ours.astype(np.int64), ref)


def test_set_test_pattern_swaps_and_restores(rng):
    """The pattern-injection hook (OpenCV `bit_pattern_31_` deployments,
    README waiver): a different pattern changes descriptors; restoring the
    default restores them bit-exactly."""
    img = jnp.asarray(rng.random((1, 64, 64), dtype=np.float32))
    xy = jnp.asarray(rng.uniform(20, 44, size=(1, 16, 2)).astype(np.float32))
    default = orb._DEFAULT_PATTERN.copy()
    d0 = np.asarray(orb.describe(img, xy, prefiltered=True))
    try:
        orb.set_test_pattern(orb.make_test_pattern(seed=99))
        d1 = np.asarray(orb.describe(img, xy, prefiltered=True))
    finally:
        orb.set_test_pattern(default)
    d2 = np.asarray(orb.describe(img, xy, prefiltered=True))
    assert not np.array_equal(d0, d1)
    assert np.array_equal(d0, d2)
