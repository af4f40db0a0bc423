"""Per-stage performance report — `test_performance.py` parity on TPU.

Per-component latency (FAST / ORB / matching, or the learned frontend's
backbone / selector / refiner), FPS, and device memory stats where the
backend exposes them.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser(prog="bench", description=__doc__)
    parser.add_argument("--frontend", choices=("orb", "learned"), default="orb")
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--num-keypoints", type=int, default=1000)
    parser.add_argument("--output", default=None)
    args = parser.parse_args(argv)

    import jax

    from ..core.camera import TUM_FR2
    from ..data import synthetic
    from ..eval import frontend_tests, metrics

    cam = TUM_FR2.scaled(args.width / 640, args.height / 480)
    seq = synthetic.SyntheticSequence(
        cam=cam,
        timestamps=synthetic.orbit_trajectory(args.batch)[0],
        poses_wc=synthetic.orbit_trajectory(args.batch)[1],
    )
    if args.frontend == "orb":
        adapter = frontend_tests.orb_adapter(num_keypoints=args.num_keypoints)
    else:
        from ..data.tum import resize_bilinear
        from ..models import frontend as frontend_mod
        import jax.numpy as jnp

        model = frontend_mod.LearnedFrontend()
        size = 448
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
        adapter = frontend_tests.learned_adapter(model, variables)

        class Resized:
            cam = seq.cam.scaled(size / seq.cam.width, size / seq.cam.height)

            def __len__(self):
                return len(seq)

            def frame(self, i):
                f = seq.frame(i)
                return {**f, "rgb": resize_bilinear(f["rgb"], size, size)}

        seq = Resized()

    result = frontend_tests.run_performance_test(seq, adapter, batch=args.batch)
    result["device"] = str(jax.devices()[0])
    print(json.dumps(result, indent=2, default=float))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2, default=float)
    return 0


if __name__ == "__main__":  # direct `python -m ...cli.x` use
    import sys as _sys

    _sys.exit(main() or 0)
