"""Bucket the flagship train step's HBM bytes by HLO instruction.

XLA's cost analysis says the compiled 128^3 b2 step accesses 443 GB while
its FLOP floor is ~0.32 s — the step is ~10x byte-heavy. This script parses
the OPTIMIZED HLO of that exact compiled executable and buckets each
instruction's output-buffer bytes (write traffic; reads are the outputs of
earlier ops, so the histogram shape is the same) by opcode and by the jax
source op_name metadata, to find where the bytes actually go.

Run (TPU): python experiments/byte_buckets.py
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2,
}

SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred|s64|u64|f64|s16|u16)\[([0-9,]*)\]")
OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def shape_bytes(text):
    """Sum byte sizes of every shape literal in an HLO result type string."""
    total = 0
    for m in SHAPE_RE.finditer(text):
        dt, dims = m.groups()
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/vdm4cdm_tpu/xla")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vdm4cdm_tpu.diffusion import VDM, make_schedule
    from vdm4cdm_tpu.models import CUNet
    from vdm4cdm_tpu.train import TrainState, make_optimizer, make_train_step

    size, batch = 128, 2
    net = CUNet(
        remat_blocks=("down_0_0",),  # bench.py's default config
        shape=(1, size, size, size), chs=(32, 64, 128, 256),
        s_conditioning_channels=1, v_conditioning_dims=(6,), norm_groups=8,
        dropout_prob=0.1, conv_padding_mode="circular",
        compute_dtype=jnp.bfloat16,
    )
    vdm = VDM(net, make_schedule("learned_linear", -13.3, 13.3))
    params = jax.jit(lambda r: vdm.init_params(r, batch_size=1))(
        jax.random.PRNGKey(0))
    optimizer = make_optimizer(moment_dtype=jnp.bfloat16)
    state = TrainState(0, params, optimizer.init(params))
    step_fn = make_train_step(vdm, optimizer)
    rng = np.random.default_rng(0)
    batch_data = {
        "x": jnp.asarray(rng.standard_normal(
            (batch, size, size, size, 1), np.float32)),
        "conditioning": jnp.asarray(rng.standard_normal(
            (batch, size, size, size, 1), np.float32)),
        "conditioning_values": [jnp.zeros((batch, 6), jnp.float32)],
    }
    key = jax.random.PRNGKey(1)

    comp = step_fn.lower(state, batch_data, key).compile()
    hlo = comp.as_text()
    print(f"optimized HLO: {len(hlo) / 1e6:.1f} MB text", flush=True)
    dump = os.environ.get("BB_DUMP_HLO")
    if dump:
        with open(dump, "w") as f:
            f.write(hlo)
        print(f"dumped optimized HLO to {dump}", flush=True)
    analyze(hlo)


def analyze(hlo):
    by_opcode = defaultdict(lambda: [0, 0])   # opcode -> [count, bytes]
    by_source = defaultdict(lambda: [0, 0])   # op_name prefix -> [count, bytes]
    big = []

    # instruction lines look like:  %name = TYPE opcode(...), metadata={...}
    # Only ENTRY-computation (and loop-body) instructions materialize HBM
    # buffers — fusion-body instructions stream through VMEM/registers, so
    # counting them wildly overstates traffic (a fusion's HBM cost is its
    # operands + its root, which the ENTRY-level fusion instruction carries).
    inst_re = re.compile(r"^\s+(?:ROOT\s+)?[%\w.-]+ = (.+?) (\w+)\(")
    comp_re = re.compile(r"^(ENTRY\s+)?%?[\w.-]+\s*\(.*\)\s*->.*\{")
    in_entry = False
    for line in hlo.splitlines():
        cm = comp_re.match(line)
        if cm or line.startswith("ENTRY"):
            in_entry = line.startswith("ENTRY") or bool(cm and cm.group(1))
            continue
        if not in_entry:
            continue
        m = inst_re.match(line)
        if not m:
            continue
        result_type, opcode = m.groups()
        if opcode in ("parameter", "constant", "tuple", "get"):
            continue
        b = shape_bytes(result_type)
        by_opcode[opcode][0] += 1
        by_opcode[opcode][1] += b
        if b >= 8 * 1024 * 1024:
            nm = OPNAME_RE.search(line)
            name = nm.group(1) if nm else "?"
            # collapse to a coarse source bucket: strip indices
            src = re.sub(r"[0-9]+", "#", name)[:120]
            by_source[src][0] += 1
            by_source[src][1] += b
            big.append((b, opcode, name[:160]))

    total = sum(v[1] for v in by_opcode.values())
    print(f"\n== output bytes by opcode (total {total / 1e9:.1f} GB) ==")
    for op, (n, b) in sorted(by_opcode.items(), key=lambda kv: -kv[1][1])[:18]:
        print(f"{op:28s} n={n:5d}  {b / 1e9:8.2f} GB")

    print("\n== >=8MB instructions bucketed by source op_name ==")
    for src, (n, b) in sorted(by_source.items(), key=lambda kv: -kv[1][1])[:30]:
        print(f"{b / 1e9:8.2f} GB  n={n:4d}  {src}")

    big.sort(reverse=True)
    print("\n== 25 biggest single outputs ==")
    for b, op, name in big[:25]:
        print(f"{b / 1e6:9.1f} MB  {op:12s} {name}")


if __name__ == "__main__":
    if len(sys.argv) > 1:  # analyze an existing HLO dump without recompiling
        analyze(open(sys.argv[1]).read())
    else:
        main()
