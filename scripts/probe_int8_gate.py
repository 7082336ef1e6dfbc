"""Focused int8 fidelity-gate probe: exactly bench.py's gate, nothing else.

Trains the vanilla step b8 for ~23 steps on the learnable synthetic batch
(bench._train_throughput), calibrates the per-input-channel int8 scheme
(bench._build_int8), and prints the held-out argmax agreement vs the bf16
forward — the 0.99 serving gate — plus one int8 throughput point. Runs in
~3 min warm on the TPU vs the full bench's ~15; used to iterate on the
quantization scheme without paying for the whole sweep.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_int8_gate.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main() -> None:
    import bench

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    t_ips, _, _, trained_vars = bench._train_throughput("vanilla", 8)
    print(f"train vanilla b8: {t_ips:.1f} img/s", file=sys.stderr)

    variables, forward = bench._build()
    q_vars, q_forward, probe, _labels, q_clip = bench._build_int8(trained_vars)
    a = jnp.argmax(forward(q_vars, probe), -1)
    bq = jnp.argmax(q_forward(q_vars, probe), -1)
    agreement = float(jnp.mean(a == bq))
    print(
        f"int8 argmax agreement vs bf16 on trained weights "
        f"(clip={q_clip}, per-channel): {agreement:.4f} "
        f"({'PASS' if agreement >= 0.99 else 'FAIL'} vs 0.99 gate)"
    )
    devt, _ = bench._time_batch(q_forward, q_vars, 128)
    print(f"int8 batch=128: {128 / devt:.1f} img/s device")


if __name__ == "__main__":
    main()
