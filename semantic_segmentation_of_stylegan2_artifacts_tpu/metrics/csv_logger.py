"""CSV logging with the reference's exact 7-file schema.

Reproduces ``scripts/csv_handler.py``: same file names, same headers, same
column orders — the machine interface the grid-search driver ranks on
(reference ``run.py:29-31`` reads ``val_metric_all_epoch.csv``'s ``Score``
column).
"""

from __future__ import annotations

import csv
import os
from .segmentation import EpochSummary


class CSVHandler:
    """Opens the 7 CSV files and exposes row writers (context manager)."""

    def __init__(self, log_save_path: str):
        os.makedirs(log_save_path, exist_ok=True)
        self._files = []

        def open_csv(name, header):
            f = open(os.path.join(log_save_path, name), "w", newline="")
            self._files.append(f)
            w = csv.writer(f)
            w.writerow(header)
            return w

        self.csv_writer = open_csv(
            "lr_range_test.csv", ["step", "lr", "train_loss", "val_loss"]
        )
        self.csv_writer_batch = open_csv(
            "batch_test_file.csv", ["epoch", "case_name"]
        )
        self.csv_all_epoch = open_csv(
            "val_metric_all_epoch.csv",
            ["epoch", "mean_accuracy", "mean_val_loss", "mean_train_loss",
             "mean_confusion_matrix_bin", "mean_confusion_matrix_soft", "Score"],
        )
        self.csv_real_epoch = open_csv(
            "val_metric_real_epoch.csv",
            ["epoch", "accuracy_real", "mean_confusion_matrix_bin",
             "mean_confusion_matrix_soft", "mean_val_loss_real", "FRP"],
        )
        self.csv_fake_epoch = open_csv(
            "val_metric_fake_epoch.csv",
            ["epoch", "mean_accuracy", "mean_val_loss_fake",
             "mean_confusion_matrix_bin", "mean_confusion_matrix_soft",
             "mean_bin_accuracy", "mean_bin_recall", "mean_bin_precision",
             "mean_bin_IoU", "mean_bin_dice", "mean_bin_f1",
             "mean_i_soft_dice", "mean_i_soft_iou"],
        )
        self.csv_batch_real = open_csv(
            "val_metric_real_batch.csv",
            ["epoch", "batch", "accuracy", "confusion_matrix_bin", " val_loss"],
        )
        self.csv_batch_fake = open_csv(
            "val_metric_fake_batch.csv",
            ["epoch", "batch", "bin_accuracy", "bin_recall", "bin_precision",
             "val_loss", "bin_IoU", "bin_dice", "bin_f1",
             "confusion_matrix_bin", "confusion_matrix_soft",
             "i_soft_dice", "i_soft_iou"],
        )

    # -- epoch-row convenience (columns per validation_functions.py) -------
    def write_epoch(self, s: EpochSummary) -> None:
        if s.n_real > 0:
            self.csv_real_epoch.writerow([
                s.epoch, s.mean_accuracy_real, s.mean_conf_bin_real,
                s.mean_conf_soft_real, s.mean_val_loss_real, s.mean_fpr,
            ])
        self.csv_fake_epoch.writerow([
            s.epoch, s.mean_accuracy_fake, s.mean_val_loss_fake,
            s.mean_conf_bin_fake, s.mean_conf_soft_fake,
            s.mean_bin_accuracy, s.mean_bin_recall, s.mean_bin_precision,
            s.mean_bin_iou, s.mean_bin_dice, s.mean_bin_f1,
            s.mean_soft_dice, s.mean_soft_iou,
        ])
        self.csv_all_epoch.writerow([
            s.epoch, s.mean_accuracy, s.mean_val_loss, s.mean_train_loss,
            s.mean_conf_bin, s.mean_conf_soft, s.score,
        ])
        self.flush()

    def return_writer(self):
        """Reference-compatible accessor (``csv_handler.py:75-76``)."""
        return (self.csv_writer, self.csv_batch_fake, self.csv_batch_real,
                self.csv_real_epoch, self.csv_fake_epoch, self.csv_all_epoch,
                self.csv_writer_batch)

    def flush(self) -> None:
        for f in self._files:
            f.flush()

    def close_files(self) -> None:
        for f in self._files:
            if not f.closed:
                f.close()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        self.close_files()

    def __del__(self):  # pragma: no cover
        try:
            self.close_files()
        except Exception:
            pass


# Reference-compatible alias.
CSV_Handler = CSVHandler
