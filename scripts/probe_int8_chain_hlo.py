"""Evidence probe for the round-5 s8-resident-chain decision (VERDICT r4 #1).

Question: in the TPU-compiled frozen-int8 serving program, does the
inter-conv activation actually round-trip HBM in bf16 (the VERDICT's
structural reading of ``ops/quant.py:204-221``), or does XLA already fuse
the dequant->BN->ReLU->requantize elementwise chain into one fusion whose
only materialized output is the next conv's padded s8 operand?

Method: compile a minimal 3-deep frozen QuantConv+BN+ReLU chain for TPU and
inspect the optimized HLO: list every fusion/conv with its output
shape+dtype, and total the bf16 vs s8 HBM bytes of fusion outputs between
the convolutions. Also dump the full text for offline reading.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_int8_chain_hlo.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rtda_semanticsegmentation_tpu.models.layers import ConvBN

B, H, W, C = 8, 128, 256, 64
OUT = "/tmp/int8_chain_hlo.txt"


class Chain(nn.Module):
    quant: str = "calib"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate((128, 128, 128)):
            x = ConvBN(
                ch, (3, 3), (1, 1), quant=self.quant, quant_min_ch=64,
                name=f"blk{i}",
            )(x, train)
        return x


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32), jnp.bfloat16)

    calib = Chain(quant="calib")
    variables = calib.init(jax.random.PRNGKey(0), x)
    _, muts = calib.apply(variables, x, mutable=["quant_stats"])
    variables = {**variables, "quant_stats": muts["quant_stats"]}
    freeze = Chain(quant="freeze")
    _, muts = freeze.apply(variables, x, mutable=["quant_frozen"])
    variables = {**variables, "quant_frozen": muts["quant_frozen"]}

    serve = Chain(quant="int8_frozen")
    fwd = jax.jit(lambda v, x: serve.apply(v, x))
    compiled = fwd.lower(variables, x).compile()
    txt = compiled.as_text()
    with open(OUT, "w") as fh:
        fh.write(txt)
    print(f"optimized HLO -> {OUT} ({len(txt)} chars)", flush=True)

    # Top-level instruction lines of the entry computation: report every
    # fusion / convolution with result type; tally the big (>= B*H*W*C/4
    # elements) intermediates by dtype.
    big_thresh = B * H * W * 32  # anything activation-sized
    dt_bytes = {"bf16": 2, "f32": 4, "s8": 1, "u8": 1, "s32": 4, "pred": 1}
    tally: dict[str, int] = {}
    for line in txt.splitlines():
        m = re.match(
            r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\w+)(?:\[[\d,]*\])?"
            r"(?:\{[^}]*\})?)\s*(fusion|convolution|custom-call)\(", line
        )
        if not m:
            continue
        name, ty, kind = m.groups()
        tym = re.match(r"(\w+)\[([\d,]*)\]", ty)
        if not tym:
            continue
        dt, dims = tym.group(1), tym.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        if n >= big_thresh:
            kindtag = ""
            if "kind=kOutput" in line:
                kindtag = " kOutput"
            elif "kind=kLoop" in line:
                kindtag = " kLoop"
            elif "kind=kInput" in line:
                kindtag = " kInput"
            print(f"  {kind}{kindtag}: {name} -> {dt}[{dims}] "
                  f"({n * dt_bytes.get(dt, 4) / 1e6:.2f} MB)", flush=True)
            tally[dt] = tally.get(dt, 0) + n * dt_bytes.get(dt, 4)
    print("\nactivation-sized op outputs by dtype:", flush=True)
    for dt, by in sorted(tally.items(), key=lambda kv: -kv[1]):
        print(f"  {dt}: {by / 1e6:.2f} MB", flush=True)

    # How do the convs consume their operands?
    print("\nconvolution lines:", flush=True)
    for line in txt.splitlines():
        if re.search(r"=\s*\S+\s+convolution\(", line):
            print("  " + line.strip()[:240], flush=True)


if __name__ == "__main__":
    main()
