#!/usr/bin/env python
"""Headline benchmark: tet-soup stress scene on the real TPU chip.

Scene (BASELINE.json config 5 / SURVEY §6 north star): a 500k-particle tet
soup — 125k independent tetrahedra — stepped by the full PD pipeline:
strain + volume constraint local steps (batched 3x3 SVDs), matrix-free
Jacobi-PCG global solve, sorted-grid broadphase + point-triangle CCD,
stabilization and friction passes.  One tick is one compiled XLA program.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares particle-iterations/sec against the measured CPU
transcription baseline in BASELINE_CPU.json (see
scripts/measure_cpu_baseline.py), scaled by the reference's 8-thread
assumption; 0.0 if the baseline file is absent.
"""

import json
import os
import time


def main():
    n_tets = int(os.environ.get("PIES_BENCH_TETS", 125_000))
    timed_ticks = int(os.environ.get("PIES_BENCH_TICKS", 10))
    warmup = int(os.environ.get("PIES_BENCH_WARMUP", 3))

    from pies_tpu import Solver
    from pies_tpu.options import SolverName, SolverOptions

    solver = Solver(
        SolverOptions(solver=SolverName.PD), enable_collisions=True
    )
    # height 0.5: the soup contacts the floor and itself immediately, so the
    # measured ticks exercise the full contact pipeline (CCD hits, contact
    # constraints in the global solve, stabilization, friction) rather than
    # free fall over an empty broadphase.
    solver.create_tet_soup(
        n_tets, spacing=1.6, scale=0.8, w=2000.0, height=0.5, jitter=0.05
    )
    solver._prepare()
    n_particles = solver._builder.num_nodes

    # Batched stepping (one dispatch per chunk): per-dispatch overhead over
    # the remote-TPU tunnel is ~27 ms x argument leaf count, which dominated
    # per-tick stepping at stress scale.  Warmup uses the SAME batch size so
    # the timed call reuses the compiled executable.
    del warmup
    solver.run_ticks(timed_ticks)

    t0 = time.perf_counter()
    solver.run_ticks(timed_ticks)
    elapsed = time.perf_counter() - t0

    assert not solver.sim_failed, "benchmark scene latched sim failure"
    steps_per_sec = timed_ticks / elapsed
    iters = solver.options.iterations * solver.options.time_substeps
    particle_iters_per_sec = steps_per_sec * n_particles * iters

    vs_baseline = 0.0
    here = os.path.dirname(os.path.abspath(__file__))
    ref_path = os.path.join(here, "BASELINE_REF.json")
    cpu_path = os.path.join(here, "BASELINE_CPU.json")
    if os.path.exists(ref_path):
        # Measured reference C++ (scripts/refbench) at the same scale,
        # scaled by the reference's 8-thread assumption (Solver.h:36) —
        # generous to the reference (its phmap/LLT would not scale linearly).
        with open(ref_path) as f:
            ref = json.load(f)
        scene = ref["scenes"].get(f"tet_soup_{n_particles}")
        if scene is not None:
            vs_baseline = particle_iters_per_sec / (
                scene["particle_iters_per_sec"]
                * ref.get("reference_thread_assumption", 8)
            )
    if vs_baseline == 0.0 and os.path.exists(cpu_path):
        # Fallback: this engine's own CPU transcription (round-1 protocol).
        with open(cpu_path) as f:
            cpu = json.load(f)
        cpu_piters = cpu["particle_iters_per_sec_single_core"] * cpu.get(
            "reference_thread_assumption", 8
        )
        vs_baseline = particle_iters_per_sec / cpu_piters

    # Roofline context (VERDICT round-2 #7): a static lower-bound estimate
    # of the HBM traffic one tick MUST move, so achieved-GB/s and the
    # percentage of the v5e peak (819 GB/s) travel with the steps/s number
    # and perf gaps are attributable round over round.  Terms follow the
    # measured per-stage trace in PLAN.md:
    #   detection: entry sort (~6 passes over 8 B (slot,item) pairs),
    #   bucket tables, query lookups (S=32) + candidate gathers (B=24),
    #   prefilter rows (24 B AABB x B), packed CCD pair rows (prev|now of
    #   m=4 corners = 96 B, read twice);
    #   PD loop: 4 iterations x (~6 reads + 1 write of [N,3] state) and the
    #   banded CG applies (7 diagonals + in/out vectors, ~2 effective trips
    #   with the rtol exit); velocity/floor passes ~4 dense sweeps.
    n_bodies = n_tets
    entries = 8 * n_bodies
    iters_pd = solver.options.iterations
    bytes_tick = (
        entries * 8 * 6
        + n_bodies * (32 * 4 * 3 + 24 * 4 * 4 + 24 * 24 + 8 * 96 * 2)
        + iters_pd * (7 * n_particles * 12)
        + iters_pd * 2 * (7 * n_particles * 4 + 2 * n_particles * 12)
        + 4 * n_particles * 12
    )
    tick_s = elapsed / timed_ticks
    hbm_gbps_est = bytes_tick / tick_s / 1e9
    print(
        json.dumps(
            {
                "metric": f"tet_soup_{n_particles}p_steps_per_sec",
                "value": round(steps_per_sec, 3),
                "unit": "steps/sec",
                "vs_baseline": round(vs_baseline, 2),
                "particle_iters_per_sec": round(particle_iters_per_sec),
                "particles": n_particles,
                "tick_ms": round(1000.0 * elapsed / timed_ticks, 2),
                "hbm_bytes_per_tick_est": bytes_tick,
                "hbm_gbps_est": round(hbm_gbps_est, 1),
                "pct_peak_hbm": round(100.0 * hbm_gbps_est / 819.0, 1),
            }
        )
    )


def _main_with_retry():
    # A killed predecessor process can leave the remote TPU wedged; the next
    # process's first device touch raises UNAVAILABLE and clears it.  One
    # retry makes the benchmark robust to that.
    try:
        main()
    except Exception as e:  # noqa: BLE001 - retry any first-touch device error
        if "UNAVAILABLE" in str(e) or "device error" in str(e):
            main()
        else:
            raise


if __name__ == "__main__":
    _main_with_retry()
