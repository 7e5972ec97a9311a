#!/usr/bin/env python3
"""Label-free batch inference:
``python predict.py --cfg config.yaml --check_point_dir DIR --out_dir DIR``."""

from semantic_segmentation_of_stylegan2_artifacts_tpu.cli.predict_cli import main

if __name__ == "__main__":
    main()
