import numpy as np

from semantic_slam_master_tpu.data import associate


def test_nearest_indices():
    ref = np.array([0.0, 1.0, 2.0, 3.0])
    q = np.array([-0.5, 0.4, 1.6, 2.9, 10.0])
    idx = associate.nearest_indices(q, ref)
    assert list(idx) == [0, 0, 2, 3, 3]


def test_associate_timestamps_basic():
    a = [0.0, 0.033, 0.066, 0.10]
    b = [0.001, 0.034, 0.068, 0.099]
    pairs = associate.associate_timestamps(a, b, max_difference=0.02)
    assert pairs == [(0, 0), (1, 1), (2, 2), (3, 3)]


def test_associate_timestamps_rejects_far():
    a = [0.0, 1.0]
    b = [0.5]
    assert associate.associate_timestamps(a, b, max_difference=0.02) == []


def test_associate_matches_reference_algorithm(rng):
    """Property test vs a direct transcription of the TUM forward-scan
    algorithm semantics (scripts/associate.py:30-68)."""

    def tum_reference(rgb_times, depth_times, max_difference):
        associations = []
        depth_index = 0
        for ri, rgb_time in enumerate(rgb_times):
            best_diff = float("inf")
            best = None
            for i in range(depth_index, len(depth_times)):
                diff = abs(rgb_time - depth_times[i])
                if diff < best_diff:
                    best_diff = diff
                    best = i
                elif diff > best_diff:
                    break
            if best is not None and best_diff < max_difference:
                associations.append((ri, best))
                depth_index = best
        return associations

    for trial in range(20):
        t_rgb = np.sort(rng.uniform(0, 10, size=rng.integers(5, 40)))
        t_depth = np.sort(rng.uniform(0, 10, size=rng.integers(5, 40)))
        ours = associate.associate_timestamps(t_rgb, t_depth, 0.15)
        ref = tum_reference(list(t_rgb), list(t_depth), 0.15)
        assert ours == ref, (trial, ours, ref)


def test_file_list_roundtrip(tmp_path):
    lines = "# header\n1.0 rgb/1.png\n2.0 rgb/2.png\n"
    p = tmp_path / "rgb.txt"
    p.write_text(lines)
    lst = associate.read_stamped_file_list(p)
    assert lst == [(1.0, "rgb/1.png"), (2.0, "rgb/2.png")]

    assoc = associate.associate_file_lists(lst, [(1.01, "depth/1.png"), (2.005, "depth/2.png")])
    assert len(assoc) == 2
    out = tmp_path / "associations.txt"
    associate.write_associations(assoc, out)
    assert len(out.read_text().strip().splitlines()) == 2
