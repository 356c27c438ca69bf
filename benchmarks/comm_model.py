"""Comm-volume scaling model for the sharded-embedding exchanges, validated
against the compiled HLO of the multi-chip dryrun (VERDICT r1 item 7).

Real ICI is not reachable from this environment (one chip behind a relay),
so the weak-scaling claim is made quantitatively instead of empirically:

1. an analytic bytes-per-step-per-device model for each exchange strategy
   (GSPMD gather / shard_map psum / all-to-all) as a function of
   (global batch B, model shards m, data shards d, embed dim D, vocab V);
2. the SAME train step jitted over an 8-virtual-device CPU mesh, with every
   collective op and its shape extracted from the compiled HLO and its ring
   /a2a wire volume summed — the analytic model must match what XLA
   actually emits (op kinds and byte totals);
3. an extrapolation to the production DLRM shape: bytes/step/device vs the
   measured single-chip step time gives the ICI bandwidth needed for ≥80%
   weak-scaling efficiency, compared against the v5e spec.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/comm_model.py
"""
from __future__ import annotations

import functools
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from recommender_tpu.core.mesh import MeshSpec, make_mesh
from recommender_tpu.core.train import TrainConfig, Trainer
from recommender_tpu.models.dlrm import DLRM
from recommender_tpu.models.tasks import init_model, make_ctr_task
from recommender_tpu.parallel.partitioning import param_shardings

print = functools.partial(print, flush=True)

F = 26  # categorical features per example
DTYPE_BYTES = 4


# --------------------------------------------------------------- analytic model
def dlrm_dense_bytes(bottom=(512, 256, 64, 16), top=(512, 256, 1),
                     n_int=13, F=26, D=16) -> int:
    """f32 bytes of the DLRM dense (non-table) params: replicated, so their
    gradient all-reduces over the data axis every step."""
    n = 0
    prev = n_int
    for u in bottom:
        n += prev * u + u
        prev = u
    prev = (F + 1) ** 2 + D  # DotInteraction flat output ∥ bottom out
    for u in top:
        n += prev * u + u
        prev = u
    return n * DTYPE_BYTES


def predict_bytes(strategy: str, B: int, m: int, d: int, D: int, V: int,
                  cf: float = 2.0, dense_bytes: int = 0) -> dict:
    """Per-device ICI bytes per train step (fwd exchange + bwd reductions).

    Ring collective wire cost per device for an n-way all-reduce of S bytes:
    2·S·(n-1)/n (reduce-scatter + all-gather). All-to-all of an [n, C]-per-
    device buffer moves S·(n-1)/n (each device keeps its own row).
    """
    n_local = B // d * F  # lookup rows owned by one data replica
    act = n_local * D * DTYPE_BYTES  # activation payload [B/d, F, D]
    out = {}
    if strategy in ("gspmd", "psum"):
        # fwd: every model shard contributes a masked [B/d, F, D]; psum over m.
        # bwd: the cotangent arrives replicated over model (transpose of a
        # psum is identity into each shard) — no second model collective.
        # WIRE bytes are identical for the gspmd and explicit-psum routes;
        # they differ in per-device COMPUTE: the shard_map psum backward
        # scatters shard-local [V/m, D], while the GSPMD route's backward
        # materializes a replicated full-table scatter per device (r4
        # compiled-HLO finding, tests/test_sharded_10m.py) — which is why
        # the planner renders 'psum' for big sharded tables.
        out["fwd_model_allreduce"] = 2 * act * (m - 1) / m
        out["bwd_model"] = 0.0
    elif strategy == "a2a":
        C = int(np.ceil(n_local / m * cf))
        ids = m * C * DTYPE_BYTES
        vecs = m * C * D * DTYPE_BYTES
        # fwd: ids out, vectors back; bwd: cotangent vectors out, (transpose
        # of the id exchange is index-only, no float traffic back)
        out["fwd_ids_a2a"] = ids * (m - 1) / m
        out["fwd_vecs_a2a"] = vecs * (m - 1) / m
        out["bwd_vecs_a2a"] = vecs * (m - 1) / m
    else:
        raise ValueError(strategy)
    # dense-param gradient all-reduce over data (MLPs; table grads are
    # sharded over model and psum'd over data): count the table part only
    # when the table is replicated over data, which it is (d × m mesh).
    table_grad = (V // m) * D * DTYPE_BYTES
    out["bwd_data_grad_allreduce"] = 2 * (table_grad + dense_bytes) * (d - 1) / d
    out["total"] = sum(out.values())
    return out


# ----------------------------------------------------------- HLO measurement
_SHAPE_RE = re.compile(r"(f32|s32|u32|bf16|pred|f64|s64)\[([\d,]*)\]")

_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "pred": 1, "f64": 8, "s64": 8}


def _shape_bytes(sig: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(sig):
        n = 1
        for x in dims.split(","):
            if x:
                n *= int(x)
        total += n * _BYTES[dt]
    return total


def collectives_in_hlo(hlo: str) -> list[tuple[str, str, int, int]]:
    """(op kind, result shapes, payload bytes, group size) per collective."""
    found = []
    for line in hlo.splitlines():
        line = line.strip()
        mm = re.match(
            r"(?:ROOT )?%?[\w.\-]+ = (.*?) "
            r"(all-reduce|all-to-all|all-gather|reduce-scatter|collective-permute)"
            r"(?:-start)?\(",
            line,
        )
        if not mm:
            continue
        sig, kind = mm.group(1), mm.group(2)
        if "-done" in line:
            continue  # counted at the -start op
        gsize = 0
        groups = re.search(r"replica_groups=\{([^}]*)\}", line)
        if groups:
            first = groups.group(1).split("},{")[0].strip("{}")
            gsize = len([x for x in first.split(",") if x.strip() != ""])
        else:  # iota format: replica_groups=[G,S]<=[...]
            iota = re.search(r"replica_groups=\[(\d+),(\d+)\]", line)
            if iota:
                gsize = int(iota.group(2))
        found.append((kind, sig, _shape_bytes(sig), gsize))
    return found


def wire_bytes(found) -> float:
    """Ring-model per-device wire bytes for the collected collectives."""
    total = 0.0
    for kind, _sig, size, g in found:
        if g <= 1:
            continue
        if kind == "all-reduce":
            total += 2 * size * (g - 1) / g
        elif kind in ("all-to-all", "all-gather", "reduce-scatter"):
            total += size * (g - 1) / g
        elif kind == "collective-permute":
            total += size
    return total


def compile_step(lookup_mode: str, mesh, B: int, V: int, D: int):
    model = DLRM(
        vocab_size=V, embed_dim=D, bottom_units=(16, D), top_units=(16, 1),
        partition="model", lookup_mode=lookup_mode,
        mesh=mesh if lookup_mode == "a2a" else None,
    )
    rng = np.random.default_rng(0)
    batch = {
        "int_features": rng.normal(size=(B, 13)).astype(np.float32),
        "cat_features": rng.integers(0, V, size=(B, F)).astype(np.int32),
        "label": (rng.random(B) < 0.5).astype(np.float32),
    }
    loss_fn, eval_fn = make_ctr_task(model)
    var_shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), batch))
    pshard = param_shardings(var_shapes["params"], mesh)
    tr = Trainer(loss_fn, TrainConfig(split_step=False), mesh=mesh,
                 param_shardings=pshard, eval_fn=eval_fn)
    state = tr.init_state(lambda: init_model(model, batch))
    dev_batch = tr.put_batch(batch)
    lowered = jax.jit(
        lambda s, b, r: tr._fused_step.__wrapped__(s, b, r)
    ).lower(state, dev_batch, jax.random.PRNGKey(0))
    return lowered.compile().as_text()


def tenm_projection():
    """Projected multi-chip step time for the 10M-vocab DLRM config
    (VERDICT r3 #4) — the sharded plan the single-chip reference point
    (RESULTS.md: f32 39.0 ms / bf16+SR 34.5 ms at b8192, dominated by the
    ~24.4 ms native 10M-row scatter) exists to escape.

    Model: t(d, m) = t_rest + t_scatter(V/m) + t_comm(a2a) + t_lat, where
    * t_rest = measured single-chip step minus its measured 10M scatter
      term (f32: 39.0 - 24.4 = 14.6 ms) — gather/MLP/optimizer terms kept
      FIXED (conservative: the per-shard gather actually shrinks ~1/m under
      a2a since each device serves only its own rows);
    * t_scatter(V/m) = the measured per-shard-size backward from
      exp_shard_backward.py --big, with the 3-way row gate's choice
      (m=4 → Pallas 10.3 ms; m=8 → padded ~5.3 ms [1M-row measurement,
      1.25M interpolates 5.3-5.5]; m=16 → 5.5; m=32 → 4.9);
    * t_comm from predict_bytes('a2a') at per-replica batch 8192 over
      v5e spec ICI (200 GB/s), t_lat the per-hop ring latency term.

    Every per-chip term is a real v5e measurement; only the ICI wire time
    is spec-derived (same caveat as the weak-scaling bounds above)."""
    t_f32, t_scatter_1chip = 39.0e-3, 24.4e-3
    t_rest = t_f32 - t_scatter_1chip
    scatter_ms = {4: 10.3, 8: 5.3, 16: 5.5, 32: 4.9}
    ici_bw, hop = 200e9, 1e-6
    prod_dense = dlrm_dense_bytes()
    print("\n10M-vocab sharded plan (f32, per-replica batch 8192; "
          "t_rest=%.1f ms measured single-chip):" % (t_rest * 1e3))
    print("  single-chip reference: 39.0 ms, 210k ex/s (238k bf16+SR), "
          "640 MB table + 1.3 GB moments on ONE chip")
    rows = []
    for d, m in ((1, 4), (1, 8), (2, 8), (1, 16), (4, 8)):
        p = predict_bytes("a2a", 8192 * d, m, d, 16, 10_000_000,
                          cf=1.25, dense_bytes=prod_dense)
        t_comm = p["total"] / ici_bw
        t_lat = (m - 1) * 3 * hop + (d - 1) * hop
        t = t_rest + scatter_ms[m] * 1e-3 + t_comm + t_lat
        exs = 8192 * d / t
        chips = d * m
        rows.append((d, m, t, exs, exs / chips))
        print(f"  d={d} m={m:2d} ({chips:2d} chips): step {t * 1e3:5.1f} ms"
              f" ({p['total'] / 1e6:5.2f} MB/chip wire, {t_comm * 1e3:.2f} ms)"
              f" → {exs / 1e3:7.0f}k ex/s, {exs / chips / 1e3:6.1f}k ex/s/chip,"
              f" {10_000_000 // m * 16 * 4 / 1e6:5.0f} MB table/chip")
    best = max(rows, key=lambda r: r[3] / (r[0] * r[1]))
    print(f"  → vs single-chip 210k ex/s: m=8 cuts the step to"
          f" ~{rows[1][2] * 1e3:.1f} ms ({rows[1][3] / 210e3:.1f}× throughput on 8 chips)"
          f" and the table to 80 MB/chip; the scatter term (24.4 → 5.3 ms)"
          " is the whole win — ICI wire adds <0.5 ms at these payloads")
    return rows


def main():
    d, m = 2, 4
    mesh = make_mesh(MeshSpec(data=d, model=m))
    B, V, D = 64, 512, 8
    print(f"mesh data={d} model={m}; DLRM B={B} V={V} D={D} F={F}\n")
    toy_dense = dlrm_dense_bytes(bottom=(16, D), top=(16, 1), F=F, D=D)
    for strategy, lookup in (("gspmd", "gspmd"), ("a2a", "a2a")):
        pred = predict_bytes(strategy, B, m, d, D, V, dense_bytes=toy_dense)
        hlo = compile_step(lookup, mesh, B, V, D)
        found = collectives_in_hlo(hlo)
        measured = wire_bytes(found)
        print(f"[{strategy}] predicted/device/step:")
        for k, v in pred.items():
            print(f"    {k:28s} {v:12,.0f} B")
        print(f"  HLO collectives:")
        for kind, sig, size, g in found:
            print(f"    {kind:20s} {size:10,d} B  groups of {g}  {sig[:60]}")
        print(f"  HLO ring-model wire bytes/device: {measured:12,.0f} B "
              f"(predicted {pred['total']:,.0f} B)\n")

    # ---------------- production-shape extrapolation (printed for RESULTS.md)
    print("production DLRM shape (B=8192 global, V=1M, D=16, F=26):")
    t_step = 8.8e-3  # measured single-chip step (benchmarks/RESULTS.md)
    ici_bw = 200e9   # v5e spec: 1,600 Gbps interchip bandwidth per chip
    # Per-hop ICI latency (order-of-magnitude; public TPU numbers put the
    # link round trip at ~1 us). A ring collective over g devices pays
    # (g-1) serialized hops. Counted per collective in the step:
    # gspmd = fwd model all-reduce + bwd data all-reduce (2 collectives);
    # a2a   = 3 all-to-alls over model + 1 data all-reduce.
    ici_hop_lat = 1e-6
    n_coll = {"gspmd": lambda m, d: [(m, 1), (d, 1)],
              "a2a": lambda m, d: [(m, 3), (d, 1)]}
    prod_dense = dlrm_dense_bytes()
    for d_prod, m_prod in ((8, 1), (4, 2), (2, 4), (1, 8)):
        for strat in ("gspmd", "a2a"):
            p = predict_bytes(strat, 8192 * d_prod, m_prod, d_prod, 16,
                              1_000_000, dense_bytes=prod_dense)
            t_comm = p["total"] / ici_bw
            t_lat = sum((g - 1) * cnt * ici_hop_lat
                        for g, cnt in n_coll[strat](m_prod, d_prod) if g > 1)
            eff = t_step / (t_step + t_comm + t_lat)  # zero-overlap lower bound
            print(f"  d={d_prod} m={m_prod} {strat:6s}: {p['total'] / 1e6:8.2f} MB/step/chip"
                  f" → {t_comm * 1e3:6.2f} ms wire + {t_lat * 1e6:5.1f} us latency,"
                  f" weak-scaling eff ≥ {eff:.1%} (no overlap)")
    print("\nlatency term: us-scale vs ms-scale wire at these shapes — the"
          "\nbandwidth model dominates; latency only matters at tiny batch.")

    # bf16+SR table (the bench.py config): activations/table grads at 2
    # bytes, measured 7.30 ms step — comm halves with the payload dtype
    # while the step shrank 18%, so the efficiency bounds barely move.
    print("\nsame, bf16-stored table (7.30 ms step, 2-byte table payloads):")
    t_step = 7.30e-3
    for d_prod, m_prod in ((8, 1), (2, 4)):
        for strat in ("gspmd", "a2a"):
            p = predict_bytes(strat, 8192 * d_prod, m_prod, d_prod, 16,
                              1_000_000, dense_bytes=prod_dense)
            # table/activation terms halve (bf16); dense-MLP grads stay f32
            dense_term = 2 * prod_dense * (d_prod - 1) / d_prod
            bf16_total = 0.5 * p["total"] + 0.5 * dense_term
            t_comm = bf16_total / ici_bw
            t_lat = sum((g - 1) * cnt * ici_hop_lat
                        for g, cnt in n_coll[strat](m_prod, d_prod) if g > 1)
            eff = t_step / (t_step + t_comm + t_lat)
            print(f"  d={d_prod} m={m_prod} {strat:6s}: {bf16_total / 1e6:8.2f} MB/step/chip"
                  f" → weak-scaling eff ≥ {eff:.1%} (no overlap)")

    tenm_projection()


if __name__ == "__main__":
    main()
