"""Aggregate an optimized-HLO text dump (compiled.as_text()) into cost buckets.

Parses each instruction line of the scheduled ENTRY + nested computations,
estimates per-op bytes (from shapes, including TPU tile padding for the
physical layout) and conv flops, and prints the top cost categories. This is
the offline substitute for a working profiler on the tunneled TPU.
"""

import re
import sys
from collections import defaultdict

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8, "c64": 8,
               "u16": 2, "s16": 2}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(dtype, dims, padded=True):
    b = DTYPE_BYTES.get(dtype)
    if b is None:
        return 0
    if not dims:
        return b
    n = 1
    if padded and len(dims) >= 2:
        # TPU tiling: minor dim padded to 128 lanes, second-minor to 8
        # sublanes (f32) / 16 (bf16). Assumes default major-to-minor layout.
        sub = 8 * (4 // min(b, 4)) if b <= 4 else 8
        d = list(dims)
        d[-1] = -(-d[-1] // 128) * 128
        d[-2] = -(-d[-2] // sub) * sub
        for x in d:
            n *= x
    else:
        for x in dims:
            n *= x
    return n * b


def parse_shapes(text):
    """All shapes appearing in an instruction line -> [(dtype, [dims]), ...]."""
    out = []
    for m in SHAPE_RE.finditer(text):
        dtype, dims = m.group(1), m.group(2)
        if dtype not in DTYPE_BYTES:
            continue
        out.append((dtype, [int(x) for x in dims.split(",") if x]))
    return out


def conv_flops(line):
    """2 * out_elems * Cin * prod(kernel_spatial). Needs dim_labels."""
    shapes = parse_shapes(line)
    if len(shapes) < 3:
        return 0
    out, lhs, rhs = shapes[0], shapes[1], shapes[2]
    m = re.search(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)", line)
    if not m:
        return 0
    rhs_labels = m.group(2)
    ki = rhs_labels.index("i")
    cin = rhs[1][ki]
    ksp = 1
    for i, ch in enumerate(rhs_labels):
        if ch not in "io":
            ksp *= rhs[1][i]
    out_elems = 1
    for x in out[1]:
        out_elems *= x
    return 2 * out_elems * cin * ksp


def main(path):
    by_op_bytes = defaultdict(int)
    by_op_count = defaultdict(int)
    conv_buckets = defaultdict(lambda: [0, 0])  # shape-sig -> [count, flops]
    fusion_bytes = defaultdict(int)
    total_conv_flops = 0
    big_lines = []

    inst_re = re.compile(r"^\s+(?:ROOT )?%?[\w.\-]+ = (\w+)\[")
    op_re = re.compile(r"= ([\w\[\],\s]*?)(\w+)\(")

    with open(path) as f:
        for line in f:
            m = op_re.search(line)
            if not m:
                continue
            op = m.group(2)
            shapes = parse_shapes(line.split("(")[0])
            nbytes = shape_bytes(*shapes[0]) if shapes else 0
            by_op_count[op] += 1
            by_op_bytes[op] += nbytes
            if op == "convolution":
                fl = conv_flops(line)
                total_conv_flops += fl
                sig = str(shapes[0])
                conv_buckets[sig][0] += 1
                conv_buckets[sig][1] += fl
            if op in ("copy", "transpose", "bitcast-convert", "convert",
                      "dynamic-update-slice", "pad", "concatenate",
                      "reshape") and nbytes > 32 * 1024 * 1024:
                big_lines.append((nbytes, line.strip()[:180]))

    print("== op counts / output bytes (padded-layout estimate) ==")
    for op, c in sorted(by_op_count.items(), key=lambda kv: -by_op_bytes[kv[0]])[:25]:
        print(f"{op:25s} n={c:6d}  out_bytes={by_op_bytes[op]/1e9:8.2f} GB")

    print(f"\n== total conv flops: {total_conv_flops/1e12:.2f} TF ==")
    print("== conv buckets by flops ==")
    items = sorted(conv_buckets.items(), key=lambda kv: -kv[1][1])
    for sig, (c, fl) in items[:15]:
        print(f"n={c:5d} flops={fl/1e12:7.3f} TF  out={sig}")
    small = sum(c for _, (c, fl) in conv_buckets.items() if fl / max(c, 1) < 5e9)
    print(f"small convs (<5 GFLOP each): {small}")

    print("\n== biggest data-movement instructions ==")
    for nbytes, l in sorted(big_lines, key=lambda kv: -kv[0])[:20]:
        print(f"{nbytes/1e6:9.1f} MB  {l}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/base_step_hlo.txt")
