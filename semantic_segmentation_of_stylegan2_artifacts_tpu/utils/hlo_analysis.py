"""Parse compiled (scheduled) HLO text into a per-op cost table.

Op-level visibility on the axon relay backend (docs/ROADMAP.md P3.12):
``jax.profiler`` degrades to a no-op there and ``--xla_dump_to`` never
materializes locally (compilation happens in a remote helper) — but
``jitted.lower(...).compile().as_text()`` DOES return the full
post-optimization, scheduled HLO module, including TPU memory layouts
(tile annotations like ``{3,2,1,0:T(8,128)(2,1)}``) and per-op source
metadata carrying the flax module scopes.  This module parses that text
and assigns each scheduled instruction:

* **bytes moved** — operand + output sizes *with physical tile padding*
  (the r2 finding that ``(…,49,49)`` windows pad ×3.4 on the bf16 tile
  falls straight out of the layout annotations);
* **MXU FLOPs** — from ``convolution``/``dot`` shapes (contraction size
  × output elements), including ops nested inside fusions;
* **transcendental counts** — exp/tanh/erf/… element counts (VPU cost);
* an **estimated roofline time** ``max(flops/peak, bytes/bw) + vpu``;
* an **attribution group** — model section and fwd/bwd direction parsed
  from the op_name metadata (flax named scopes survive into HLO).

Estimates are per-op shares of a compute model, not measurements; the
breakdown CLI (tools/hlo_breakdown.py) scales them to a measured step
time so the shares can be read as milliseconds.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, Iterable, List, Optional, Tuple

# v5e (TPU v5 lite) roofline constants
PEAK_BF16_FLOPS = 197e12
PEAK_F32_FLOPS = 49e12
HBM_BW = 819e9  # bytes/sec
# effective elementwise transcendental throughput (elements/sec); anchor:
# the measured erf-GELU tax (~1.3 ms per forward over ~1.8e9 elements, r2)
VPU_TRANS = 2.0e12

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s4": 1, "u4": 1,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4,
    "f64": 8, "s64": 8, "u64": 8, "c64": 8, "c128": 16,
    "token": 0, "opaque": 0,
}

_TRANS_OPS = {"tanh", "exponential", "log", "power", "sqrt", "rsqrt",
              "erf", "logistic", "sine", "cosine", "atan2",
              "exponential-minus-one", "log-plus-one", "cbrt"}


@dataclasses.dataclass
class Shape:
    dtype: str
    dims: Tuple[int, ...]
    tile: Tuple[int, ...] = ()     # e.g. (8, 128)
    packing: int = 1               # e.g. 2 for bf16 (2,1) sub-tiles
    minor_to_major: Tuple[int, ...] = ()

    @property
    def elems(self) -> int:
        n = 1
        for d in self.dims:
            n *= d
        return n

    @property
    def bytes_logical(self) -> int:
        return self.elems * _DTYPE_BYTES.get(self.dtype, 4)

    @property
    def bytes_padded(self) -> int:
        """Physical size in HBM including tile padding."""
        bpe = _DTYPE_BYTES.get(self.dtype, 4)
        if not self.dims:
            # scalars live in a full tile but are cheap either way
            return max(bpe, 1)
        if not self.tile:
            return self.bytes_logical
        # physical dim order: minor_to_major gives the physical layout;
        # the tile applies to the physically minormost len(tile) dims
        order = (self.minor_to_major
                 if len(self.minor_to_major) == len(self.dims)
                 else tuple(reversed(range(len(self.dims)))))
        dims = list(self.dims)
        if len(self.tile) == 1:
            t = self.tile[0]
            i = order[0]
            dims[i] = -(-dims[i] // t) * t
        else:
            tb = self.tile[-1]          # lane tile (minormost)
            ta = self.tile[-2] * self.packing  # sublane tile
            i_minor = order[0]
            dims[i_minor] = -(-dims[i_minor] // tb) * tb
            if len(dims) > 1:
                i_sub = order[1]
                dims[i_sub] = -(-dims[i_sub] // ta) * ta
        n = 1
        for d in dims:
            n *= d
        return n * bpe


@dataclasses.dataclass
class Instruction:
    name: str
    opcode: str
    shapes: List[Shape]
    operands: List[str]
    attrs: str
    op_name: str = ""
    source: str = ""
    is_root: bool = False

    @property
    def out_bytes(self) -> int:
        return sum(s.bytes_padded for s in self.shapes)


@dataclasses.dataclass
class Computation:
    name: str
    instructions: List[Instruction]
    is_entry: bool = False

    def table(self) -> Dict[str, Instruction]:
        return {i.name: i for i in self.instructions}


_SHAPE_RE = re.compile(
    r"([a-z]\d*[a-z]*\d*)\[([\d,]*)\]"          # dtype[dims]
    r"(?:\{([\d,]*)"                             # {minor_to_major
    r"(?::T(\([\dx,]+\))((?:\(\d+,\d+\))?))?"    # :T(tile)(packing)
    r"[^}]*\})?"                                 # trailing S(1) etc.
)


def parse_shapes(type_str: str) -> List[Shape]:
    """All array shapes inside a (possibly tuple) HLO type string."""
    out = []
    for m in _SHAPE_RE.finditer(type_str):
        dtype, dims_s, mtm_s, tile_s, pack_s = m.groups()
        if dtype not in _DTYPE_BYTES:
            continue
        dims = tuple(int(d) for d in dims_s.split(",")) if dims_s else ()
        tile: Tuple[int, ...] = ()
        packing = 1
        if tile_s:
            tile = tuple(int(t) for t in
                         tile_s.strip("()").replace("x", ",").split(","))
        if pack_s:
            packing = int(pack_s.strip("()").split(",")[0])
        mtm = (tuple(int(d) for d in mtm_s.split(","))
               if mtm_s else ())
        out.append(Shape(dtype, dims, tile, packing, mtm))
    return out


def _balanced(s: str, start: int) -> int:
    """Index one past the matching ')' for the '(' at ``start``."""
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return len(s)


_META_OPNAME = re.compile(r'op_name="([^"]*)"')
_META_SOURCE = re.compile(r'source_file="([^"]*)".*?source_line=(\d+)')
_OPERAND_RE = re.compile(r"%([\w.\-]+)")


def parse_instruction(line: str) -> Optional[Instruction]:
    line = line.strip().rstrip(",")
    is_root = line.startswith("ROOT ")
    if is_root:
        line = line[5:]
    if not line.startswith("%") or " = " not in line:
        return None
    lhs, rhs = line.split(" = ", 1)
    name = lhs.strip().lstrip("%")
    # rhs = TYPE OPCODE(operands), attrs...; tuple TYPEs contain spaces
    if rhs.startswith("("):
        t_end = _balanced(rhs, 0)
        type_str = rhs[:t_end]
        rest = rhs[t_end:].lstrip()
    else:
        sp = rhs.index(" ")
        type_str = rhs[:sp]
        rest = rhs[sp + 1:]
    par = rest.find("(")
    if par < 0:
        return None
    opcode = rest[:par].strip()
    op_end = _balanced(rest, par)
    operand_str = rest[par + 1:op_end - 1]
    attrs = rest[op_end:].lstrip(", ")
    operands = _OPERAND_RE.findall(operand_str)
    meta_op, meta_src = "", ""
    m = _META_OPNAME.search(attrs)
    if m:
        meta_op = m.group(1)
    m = _META_SOURCE.search(attrs)
    if m:
        meta_src = f"{m.group(1)}:{m.group(2)}"
    return Instruction(name, opcode, parse_shapes(type_str), operands,
                       attrs, meta_op, meta_src, is_root)


_COMP_HEADER = re.compile(r"^(ENTRY\s+)?%?([\w.\-]+)\s*\(.*\)\s*->.*\{\s*$")


def parse_module(text: str) -> Dict[str, Computation]:
    """Scheduled HLO module text -> {computation name: Computation}."""
    comps: Dict[str, Computation] = {}
    cur: Optional[Computation] = None
    for raw in text.splitlines():
        line = raw.rstrip()
        if cur is None:
            m = _COMP_HEADER.match(line.strip())
            if m:
                cur = Computation(m.group(2), [], is_entry=bool(m.group(1)))
            continue
        if line.strip() == "}":
            comps[cur.name] = cur
            cur = None
            continue
        inst = parse_instruction(line)
        if inst is not None:
            cur.instructions.append(inst)
    return comps


def entry_computation(comps: Dict[str, Computation]) -> Computation:
    for c in comps.values():
        if c.is_entry:
            return c
    raise ValueError("no ENTRY computation found")


_DIMLBL_RE = re.compile(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)")
_WINDOW_RE = re.compile(r"window=\{[^}]*size=([\dx]+)")
_CONTRACT_RE = re.compile(r"lhs_contracting_dims=\{([\d,]+)\}")
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")


def _conv_flops(inst: Instruction, symtab: Dict[str, Instruction]) -> float:
    """2 * out_elems * contraction for convolution ops (dots included —
    XLA:TPU lowers dot_general to convolution in scheduled HLO)."""
    if not inst.shapes:
        return 0.0
    out_elems = inst.shapes[0].elems
    m = _DIMLBL_RE.search(inst.attrs)
    contraction = 0.0
    if m and len(inst.operands) >= 2:
        rhs_lbl = m.group(2)
        rhs = symtab.get(inst.operands[1])
        if rhs is not None and rhs.shapes and \
                len(rhs.shapes[0].dims) == len(rhs_lbl):
            i_pos = rhs_lbl.find("i")
            contraction = (rhs.shapes[0].dims[i_pos] if i_pos >= 0 else 1)
            wm = _WINDOW_RE.search(inst.attrs)
            if wm:
                for t in wm.group(1).split("x"):
                    contraction *= int(t)
    if not contraction:
        # fall back: assume square-ish — can't resolve operands
        contraction = 1.0
    return 2.0 * out_elems * contraction


def _dot_flops(inst: Instruction, symtab: Dict[str, Instruction]) -> float:
    if not inst.shapes:
        return 0.0
    out_elems = inst.shapes[0].elems
    m = _CONTRACT_RE.search(inst.attrs)
    contraction = 1.0
    if m and inst.operands:
        lhs = symtab.get(inst.operands[0])
        if lhs is not None and lhs.shapes:
            for d in m.group(1).split(","):
                di = int(d)
                if di < len(lhs.shapes[0].dims):
                    contraction *= lhs.shapes[0].dims[di]
    return 2.0 * out_elems * contraction


@dataclasses.dataclass
class OpCost:
    name: str
    opcode: str
    bytes: int = 0
    flops: float = 0.0
    trans_elems: float = 0.0
    op_name: str = ""
    source: str = ""
    flops_dtype: str = "bf16"
    is_kernel: bool = False

    @property
    def est_seconds(self) -> float:
        peak = PEAK_BF16_FLOPS if self.flops_dtype in ("bf16", "f16") \
            else PEAK_F32_FLOPS
        t = max(self.flops / peak, self.bytes / HBM_BW)
        return t + self.trans_elems / VPU_TRANS


def _fusion_inner_costs(
    comp: Computation,
    comps: Dict[str, Computation],
) -> Tuple[float, float, str, str]:
    """(flops, trans_elems, hottest op_name, dtype) inside a fusion body."""
    symtab = comp.table()
    flops = 0.0
    trans = 0.0
    hot_name, hot_flops, dtype = "", -1.0, "bf16"
    for inst in comp.instructions:
        f = 0.0
        if inst.opcode == "convolution":
            f = _conv_flops(inst, symtab)
        elif inst.opcode == "dot":
            f = _dot_flops(inst, symtab)
        elif inst.opcode == "fusion":
            m = _CALLS_RE.search(inst.attrs)
            if m and m.group(1) in comps:
                fi, ti, hn, dt = _fusion_inner_costs(comps[m.group(1)], comps)
                f += fi
                trans += ti
                if fi > hot_flops:
                    hot_flops, hot_name, dtype = fi, hn or inst.op_name, dt
        elif inst.opcode in _TRANS_OPS and inst.shapes:
            trans += inst.shapes[0].elems
        if f > 0:
            flops += f
            if f > hot_flops:
                hot_flops = f
                hot_name = inst.op_name
                if inst.shapes:
                    dtype = inst.shapes[0].dtype
    return flops, trans, hot_name, dtype


# opcodes that move no data / are free at schedule level.  ``*-done`` halves
# of async pairs carry no cost of their own (the start was counted);
# ConcatBitcast stitches VMEM prefetch slices without touching HBM.
_FREE_OPS = {"parameter", "constant", "bitcast", "tuple", "get-tuple-element",
             "after-all", "iota", "copy-done", "async-done"}

# ops that read only what they write (not their whole operand buffers)
_OUTPUT_ONLY = {"slice", "dynamic-slice", "gather", "copy-start",
                "async-start"}


def analyze(text: str) -> List[OpCost]:
    """Cost every scheduled instruction of the entry computation.

    Byte accounting: every tensor an op reads or writes in HBM counts
    once at its *physically padded* size; async DMA pairs count at the
    start only; slices/gathers count their output, not the buffer they
    index; dynamic-update-slice counts the updated region twice
    (read-modify-write).
    """
    comps = parse_module(text)
    entry = entry_computation(comps)
    symtab = entry.table()
    out: List[OpCost] = []
    for inst in entry.instructions:
        if inst.opcode in _FREE_OPS:
            continue
        if inst.opcode == "custom-call" and "ConcatBitcast" in inst.attrs:
            continue  # VMEM-slice stitch: no HBM traffic
        oc = OpCost(inst.name, inst.opcode, op_name=inst.op_name,
                    source=inst.source)
        if inst.shapes:
            oc.flops_dtype = inst.shapes[0].dtype
        if inst.opcode == "async-start":
            # async slice prefetch (HBM -> VMEM DMA): the called body is a
            # slice; traffic = its output, attributed via its metadata
            m = _CALLS_RE.search(inst.attrs)
            body = comps.get(m.group(1)) if m else None
            if body is not None and body.instructions:
                root = body.instructions[-1]
                oc.bytes = root.out_bytes
                oc.op_name = oc.op_name or root.op_name
            else:
                oc.bytes = inst.out_bytes
            oc.opcode = "async-prefetch"
            out.append(oc)
            continue
        if inst.opcode in _OUTPUT_ONLY:
            oc.bytes = 2 * inst.out_bytes  # read the region + write it
        elif inst.opcode == "dynamic-update-slice":
            upd = symtab.get(inst.operands[1]) if len(inst.operands) > 1 \
                else None
            region = upd.out_bytes if upd is not None else inst.out_bytes
            oc.bytes = 2 * region
        else:
            oc.bytes = inst.out_bytes
            for op in inst.operands:
                src = symtab.get(op)
                if src is not None and src.opcode != "constant":
                    oc.bytes += src.out_bytes
        if inst.opcode == "convolution":
            oc.flops = _conv_flops(inst, symtab)
        elif inst.opcode == "dot":
            oc.flops = _dot_flops(inst, symtab)
        elif inst.opcode == "fusion":
            m = _CALLS_RE.search(inst.attrs)
            if m and m.group(1) in comps:
                f, t, hot, dt = _fusion_inner_costs(comps[m.group(1)], comps)
                oc.flops, oc.trans_elems = f, t
                if hot:  # attribute the fusion to its hottest inner op
                    oc.op_name = hot
                    oc.flops_dtype = dt
        elif inst.opcode == "custom-call":
            oc.is_kernel = "tpu_custom_call" in inst.attrs
        elif inst.opcode in _TRANS_OPS and inst.shapes:
            oc.trans_elems = inst.shapes[0].elems
        out.append(oc)
    return out


# ---- attribution ----------------------------------------------------------

_SECTION_RE = re.compile(
    r"/(patch_embed|layers_up_\d+|layers_cent\d_\d+|layers_\d+|"
    r"concat_back_dim_\d+|norm_up|norm|up|output)/"
)
_BLOCK_RE = re.compile(r"/(blocks_\d+)/")
_LEAF_RE = re.compile(
    r"/(attn|qkv|proj|mlp|fc1|fc2|downsample|upsample|expand|reduction)(?=/)"
)


def attribute(op_name: str) -> Tuple[str, str, str]:
    """op_name metadata -> (direction, section, leaf)."""
    direction = "bwd" if "transpose(" in op_name else "fwd"
    if re.search(r"/(adamw?|chain|opt|scale_by)", op_name) or \
            "update" in op_name.split("/")[-1:]:
        return ("opt", "optimizer", "")
    m = _SECTION_RE.search(op_name)
    section = m.group(1) if m else "other"
    leaves = _LEAF_RE.findall(op_name)
    leaf = leaves[-1] if leaves else ""  # most specific scope wins
    return direction, section, leaf


def group_costs(costs: Iterable[OpCost]):
    """Aggregate into {(direction, section): {...}} plus totals."""
    groups: Dict[Tuple[str, str], Dict[str, float]] = {}
    for c in costs:
        d, s, _ = attribute(c.op_name)
        g = groups.setdefault((d, s), dict(
            est=0.0, bytes=0.0, flops=0.0, trans=0.0, n=0))
        g["est"] += c.est_seconds
        g["bytes"] += c.bytes
        g["flops"] += c.flops
        g["trans"] += c.trans_elems
        g["n"] += 1
    return groups
