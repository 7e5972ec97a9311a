#!/usr/bin/env python3
"""Grid-search driver: ``python run.py [--cfg config.yaml]``."""

from semantic_segmentation_of_stylegan2_artifacts_tpu.cli.run_cli import main

if __name__ == "__main__":
    main()
