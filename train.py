#!/usr/bin/env python3
"""One training run: ``python train.py --cfg config.yaml``."""

from semantic_segmentation_of_stylegan2_artifacts_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
