"""Unit tests for the scheduled-HLO cost parser (utils/hlo_analysis.py).

The golden snippet below is (an abridged copy of) real v5e scheduled HLO
returned by ``compiled.as_text()`` over the axon relay — tile layouts,
packed bf16 sub-tiles, fusion nesting, and source metadata included.
"""

import pytest

from semantic_segmentation_of_stylegan2_artifacts_tpu.utils import (
    hlo_analysis as H,
)

GOLDEN = """\
HloModule jit_f, is_scheduled=true, entry_computation_layout={(bf16[256,256]{1,0:T(8,128)(2,1)}, bf16[256,256]{1,0:T(8,128)(2,1)})->bf16[256,256]{1,0:T(8,128)(2,1)}}

%region_0.1.clone (reduce_sum.1: bf16[], reduce_sum.2: bf16[]) -> bf16[] {
  %reduce_sum.2 = bf16[]{:T(256)} parameter(1), metadata={op_name="reduce_sum"}
  %reduce_sum.1 = bf16[]{:T(256)} parameter(0), metadata={op_name="reduce_sum"}
  ROOT %reduce_sum.6 = bf16[]{:T(256)} add(%reduce_sum.1, %reduce_sum.2), metadata={op_name="reduce_sum"}
}

%fused_computation.1 (param_0.5: bf16[256,256], param_1.5: bf16[256,256], param_2.1: bf16[]) -> bf16[256,256] {
  %param_0.5 = bf16[256,256]{1,0:T(8,128)(2,1)S(1)} parameter(0)
  %param_1.5 = bf16[256,256]{1,0:T(8,128)(2,1)S(1)} parameter(1)
  %convolution.3 = bf16[256,256]{1,0:T(8,128)(2,1)} convolution(%param_0.5, %param_1.5), dim_labels=bf_io->bf, metadata={op_name="jit(f)/jit(f)/dot_general" source_file="/tmp/probe.py" source_line=10}
  %tanh.4 = bf16[256,256]{1,0:T(8,128)(2,1)} tanh(%convolution.3), metadata={op_name="jit(f)/jit(f)/tanh"}
  %param_2.1 = bf16[]{:T(256)} parameter(2)
  %add.5 = bf16[256,256]{1,0:T(8,128)(2,1)} broadcast(%param_2.1), dimensions={}, metadata={op_name="jit(f)/jit(f)/add"}
  ROOT %add.4 = bf16[256,256]{1,0:T(8,128)(2,1)} add(%tanh.4, %add.5), metadata={op_name="jit(f)/jit(f)/add"}
}

ENTRY %main.3 (Arg_0.1: bf16[256,256], Arg_1.2: bf16[256,256]) -> bf16[256,256] {
  %Arg_0.1 = bf16[256,256]{1,0:T(8,128)(2,1)} parameter(0), metadata={op_name="a"}
  %Arg_1.2 = bf16[256,256]{1,0:T(8,128)(2,1)} parameter(1), metadata={op_name="b"}
  %reduce = bf16[]{:T(256)} reduce(%Arg_0.1), dimensions={0,1}, to_apply=%region_0.1.clone, metadata={op_name="jit(f)/jit(f)/reduce_sum" source_file="/tmp/probe.py" source_line=10}
  ROOT %fusion = bf16[256,256]{1,0:T(8,128)(2,1)} fusion(%Arg_0.1, %Arg_1.2, %reduce), kind=kOutput, calls=%fused_computation.1, metadata={op_name="jit(f)/jit(f)/add" source_file="/tmp/probe.py" source_line=10}
}
"""

# a window-attention-shaped tensor with heavy tile padding: (64,49,49) bf16
PADDED = """\
HloModule pad_probe, is_scheduled=true

ENTRY %main.1 (p0: bf16[64,49,49]) -> bf16[64,49,49] {
  %p0 = bf16[64,49,49]{2,1,0:T(8,128)(2,1)} parameter(0)
  ROOT %copy.1 = bf16[64,49,49]{2,1,0:T(8,128)(2,1)} copy(%p0), metadata={op_name="x"}
}
"""


def test_parse_module_structure():
    comps = H.parse_module(GOLDEN)
    assert set(comps) == {"region_0.1.clone", "fused_computation.1", "main.3"}
    entry = H.entry_computation(comps)
    assert entry.name == "main.3"
    assert [i.opcode for i in entry.instructions] == [
        "parameter", "parameter", "reduce", "fusion"]
    root = entry.instructions[-1]
    assert root.is_root
    assert root.operands == ["Arg_0.1", "Arg_1.2", "reduce"]
    assert root.op_name == "jit(f)/jit(f)/add"
    assert root.source == "/tmp/probe.py:10"


def test_shape_parsing_and_padding():
    (s,) = H.parse_shapes("bf16[256,256]{1,0:T(8,128)(2,1)}")
    assert s.dtype == "bf16" and s.dims == (256, 256)
    assert s.tile == (8, 128) and s.packing == 2
    # 256 and 256 are already tile-aligned: padded == logical
    assert s.bytes_padded == s.bytes_logical == 256 * 256 * 2

    (s,) = H.parse_shapes("f32[7,130]{1,0:T(8,128)}")
    # 7 -> 8 sublanes, 130 -> 256 lanes
    assert s.bytes_padded == 8 * 256 * 4

    (s,) = H.parse_shapes("bf16[64,49,49]{2,1,0:T(8,128)(2,1)}")
    # minor 49 -> 128 lanes, second-minor 49 -> 64 (packed (8*2)-row tiles)
    assert s.bytes_padded == 64 * 64 * 128 * 2
    # the r2 headline: window scores pad ~3.4x on the bf16 tile
    assert s.bytes_padded / s.bytes_logical == pytest.approx(3.41, abs=0.01)


def test_flops_and_transcendentals():
    costs = {c.name: c for c in H.analyze(GOLDEN)}
    fusion = costs["fusion"]
    assert fusion.flops == 2 * 256**3          # the inner 256x256x256 matmul
    assert fusion.trans_elems == 256 * 256     # the tanh
    # fusion attributed to its hottest inner op (the dot), not its root
    assert fusion.op_name.endswith("dot_general")
    assert fusion.flops_dtype == "bf16"
    # bytes: three real operands (two 128KB matrices + scalar) + output
    assert fusion.bytes >= 3 * 256 * 256 * 2


def test_padded_bytes_through_analyze():
    costs = H.analyze(PADDED)
    (copy,) = costs
    assert copy.opcode == "copy"
    assert copy.bytes == 2 * 64 * 64 * 128 * 2  # in + out, both padded


def test_attribution():
    d, s, leaf = H.attribute(
        "jit(train_step)/jvp(MSUNet)/msunet/layers_2/blocks_7/attn/qkv/"
        "dot_general")
    assert (d, s, leaf) == ("fwd", "layers_2", "qkv")
    d, s, _ = H.attribute(
        "jit(train_step)/transpose(jvp(MSUNet))/msunet/layers_up_1/"
        "blocks_0/mlp/fc1/dot_general")
    assert (d, s) == ("bwd", "layers_up_1")
    d, s, _ = H.attribute("jit(train_step)/msunet/up/expand/dot_general")
    assert s == "up"


def test_group_costs():
    groups = H.group_costs(H.analyze(GOLDEN))
    # everything in GOLDEN is unscoped -> ("fwd", "other")
    assert ("fwd", "other") in groups
    g = groups[("fwd", "other")]
    assert g["flops"] == 2 * 256**3
    assert g["n"] == 2  # reduce + fusion
