"""Command-line entry points.

Mirrors the reference's script surface (SURVEY.md §2.1/§3):

- ``train``        <- semantic-slam/train.py
- ``run-slam``     <- baselines/*/scripts/run_baseline.sh (internalized)
- ``evaluate``     <- scripts/evaluate_baseline.py
- ``run-tests``    <- semantic-slam/test/run_all_tests.py
- ``associate``    <- scripts/associate.py
- ``check-setup``  <- scripts/check_setup.sh + semantic-slam/setup.py
- ``download-tum`` <- data/download_tum_rgbd.py
- ``visualize``    <- semantic-slam/visualize*.py

All are invoked via ``python -m semantic_slam_master_tpu <command>``.
"""
