"""Config system + YAML editor tests (reference schema parity)."""

import textwrap

import pytest
import yaml

from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
    CfgNode,
    default_config,
    load_config,
    save_config,
)
from semantic_segmentation_of_stylegan2_artifacts_tpu.core.yaml_editor import (
    ConfigParser,
)


def test_defaults_match_reference_schema():
    c = default_config()
    assert c.DATA.BATCH_SIZE == 2
    assert c.DATA.IMG_SIZE == 1024
    assert c.MODEL.SWIN.EMBED_DIM == 128
    assert c.MODEL.SWIN.DEPTHS == [2, 2, 18, 2]
    assert c.MODEL.SWIN.NUM_HEADS == [4, 8, 16, 32]
    assert c.MODEL.SWIN.WINDOW_SIZE == 7
    assert c.TRAIN.OPTIMIZER.BETAS == (0.9, 0.999)
    assert c.TRAIN.SIG_THRESHOLD == 0.5
    assert c.SEED == 1234


def test_freeze_blocks_mutation():
    c = default_config()
    c.freeze()
    with pytest.raises(AttributeError):
        c.DATA.BATCH_SIZE = 4
    c.defrost()
    c.DATA.BATCH_SIZE = 4
    assert c.DATA.BATCH_SIZE == 4


def test_merge_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        load_config(str(p))


def test_merge_and_base_includes(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("DATA:\n  IMG_SIZE: 512\nTRAIN:\n  MAX_EPOCHS: 5\n")
    child = tmp_path / "child.yaml"
    child.write_text(
        "BASE: ['base.yaml']\nDATA:\n  BATCH_SIZE: 4\nSEED: 7\n"
    )
    c = load_config(str(child))
    assert c.DATA.IMG_SIZE == 512  # from base
    assert c.DATA.BATCH_SIZE == 4  # from child
    assert c.TRAIN.MAX_EPOCHS == 5
    assert c.SEED == 7
    assert c.is_frozen()


def test_type_coercion(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("TRAIN:\n  BASE_LR: 1\n  OPTIMIZER:\n    BETAS: [0.5, 0.9]\n")
    c = load_config(str(p))
    assert isinstance(c.TRAIN.BASE_LR, float)
    assert c.TRAIN.OPTIMIZER.BETAS == (0.5, 0.9)


def test_reference_config_yaml_ports_1to1(tmp_path):
    """The reference's own config.yaml knob names all load."""
    ref_yaml = {
        "BASE": [],
        "DATA": {"BATCH_SIZE": 2, "DATA_PATH": "./dataset", "IMG_SIZE": 1024,
                 "PIN_MEMORY": True, "NUM_WORKERS": 2},
        "HARDWARE": {"N_GPU": 1},
        "MODEL": {
            "TYPE": "swin", "NAME": "swin_b", "PRETRAIN_WEIGHTS": "segface",
            "NUM_CLASSES": 1, "DROP_RATE": 0.0, "DROP_PATH_RATE": 0.1,
            "ATTN_DROP_RATE": 0.05, "LABEL_SMOOTHING": 0.0,
            "FREEZE_ENCODER": False,
            "SWIN": {"PATCH_SIZE": 4, "IN_CHANS": 3, "EMBED_DIM": 128,
                     "DEPTHS": [2, 2, 18, 2], "DECODER_DEPTHS": [2, 2, 6, 2],
                     "NUM_HEADS": [4, 8, 16, 32], "WINDOW_SIZE": 7,
                     "MLP_RATIO": 4.0, "QKV_BIAS": True, "QK_SCALE": None,
                     "APE": False, "PATCH_NORM": True,
                     "FINAL_UPSAMPLE": "expand_first"},
        },
        "TRAIN": {"MAX_EPOCHS": 60, "WARMUP_EPOCHS": 20,
                  "WEIGHT_DECAY": 0.001, "BASE_LR": 1e-5,
                  "WARMUP_LR": 1e-6, "MIN_LR": 1e-6,
                  "TVERSKY_LOSS_ALPHA": 0.2, "TVERSKY_LOSS_BETA": 0.8,
                  "LOSS_TVERSKY_BCE_MIX": 0.45, "SIG_THRESHOLD": 0.5,
                  "EARLY_STOPPING_FLAG": False, "EARLY_STOPPING_PATIENCE": 6,
                  "LR_SCHEDULER": {"NAME": "cosine", "WARMUP_PREFIX": True},
                  "OPTIMIZER": {"NAME": "adamw", "EPS": 1e-8,
                                "BETAS": [0.9, 0.999]}},
        "TEST": {"SIG_THRESHOLD": 0.5},
        "OUTPUT_DIR": "model_out/test",
        "LIST_DIR": "./lists",
        "SEED": 120,
        "DETERMINISTIC": True,
        "SHOW_PREDICTIONS": 1,
        "SAVE_BEST_RUN": True,
        "SAVE_LAST_RUN": False,
        "DYNAMIC_LOADER": False,
    }
    p = tmp_path / "ref.yaml"
    p.write_text(yaml.safe_dump(ref_yaml))
    c = load_config(str(p))
    assert c.TRAIN.TVERSKY_LOSS_ALPHA == 0.2
    assert c.MODEL.ATTN_DROP_RATE == 0.05
    assert c.SEED == 120


def test_save_roundtrip(tmp_path):
    c = default_config()
    out = tmp_path / "dump" / "config_used.yaml"
    save_config(c, str(out))
    c2 = load_config(str(out))
    assert c2.to_dict() == c.to_dict()


# ---------------------------------------------------------------------------
# YAML editor
# ---------------------------------------------------------------------------
YAML_DOC = textwrap.dedent(
    """\
    # top comment
    DATA:
      BATCH_SIZE: 2   # keep me
      IMG_SIZE: 1024
    MODEL:
      SWIN:
        DEPTHS: [2, 2, 18, 2]
      DROP_PATH_RATE: 0.1
    TRAIN:
      BASE_LR: 0.00001
    OUTPUT_DIR: 'model_out/x'
    """
)


def test_editor_set_scalar_preserves_comments(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(YAML_DOC)
    ed = ConfigParser(str(p))
    ed.set_value("DATA.BATCH_SIZE", 8)
    ed.set_value("TRAIN.BASE_LR", 3e-4)
    ed.save()
    text = p.read_text()
    assert "# top comment" in text
    assert "# keep me" in text
    data = yaml.safe_load(text)
    assert data["DATA"]["BATCH_SIZE"] == 8
    assert abs(data["TRAIN"]["BASE_LR"] - 3e-4) < 1e-12
    # untouched keys keep their formatting
    assert "IMG_SIZE: 1024" in text


def test_editor_nested_same_key_name(tmp_path):
    doc = "A:\n  X: 1\nB:\n  X: 2\n"
    p = tmp_path / "c.yaml"
    p.write_text(doc)
    ed = ConfigParser(str(p))
    ed.set_value("B.X", 9)
    ed.save()
    data = yaml.safe_load(p.read_text())
    assert data["A"]["X"] == 1
    assert data["B"]["X"] == 9


def test_editor_list_index(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(YAML_DOC)
    ed = ConfigParser(str(p))
    ed.set_value("MODEL.SWIN.DEPTHS[2]", 6)
    ed.save()
    data = yaml.safe_load(p.read_text())
    assert data["MODEL"]["SWIN"]["DEPTHS"] == [2, 2, 6, 2]


def test_editor_get_value(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(YAML_DOC)
    ed = ConfigParser(str(p))
    assert ed.get_value("MODEL.DROP_PATH_RATE") == 0.1
    assert ed.get_value("MODEL.SWIN.DEPTHS[2]") == 18


def test_shipped_config_loads():
    """The repo's own config.yaml must load (regression: OPTIMIZER.EPS
    '1e-8' parses as a STRING under YAML 1.1 and needs yacs-style
    numeric coercion)."""
    import os

    from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
        load_config,
    )

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo_root, "config.yaml"))
    assert isinstance(cfg.TRAIN.OPTIMIZER.EPS, float)
    assert abs(cfg.TRAIN.OPTIMIZER.EPS - 1e-8) < 1e-20
    assert cfg.TPU.USE_PALLAS_ATTENTION is True


def test_scientific_notation_string_coercion(tmp_path):
    from semantic_segmentation_of_stylegan2_artifacts_tpu.core.config import (
        load_config,
    )

    p = tmp_path / "c.yaml"
    p.write_text("TRAIN:\n  OPTIMIZER:\n    EPS: 1e-6\n  BASE_LR: 3e-5\n")
    cfg = load_config(str(p))
    assert abs(cfg.TRAIN.OPTIMIZER.EPS - 1e-6) < 1e-18
    assert abs(cfg.TRAIN.BASE_LR - 3e-5) < 1e-12
