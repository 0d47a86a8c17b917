"""Produce SCALING.md: compiled-HLO communication analysis + measured
virtual-mesh scaling for the sharded CAVI fit.

Run on CPU with 8 virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_eval.py

The multi-host efficiency claim is *argued* from the compiled program
(collective bytes per iteration vs measured per-iteration compute), since
this environment has one real chip; see tame/parallel/comm_analysis.py.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import os

os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                           + os.environ.get("XLA_FLAGS", ""))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tame.inference import cavi  # noqa: E402
from tame.models import TemporalAMEModel  # noqa: E402
from tame.parallel import measure_scaling_efficiency  # noqa: E402
from tame.parallel.comm_analysis import analyze_sharded_fit  # noqa: E402

# Hardware model (stated assumptions, conservative public figures):
ICI_BW = 180e9     # bytes/s effective per mesh axis (bidirectional ring)
DCN_BW = 25e9      # bytes/s per host (200 Gbit/s NIC)


def _measured_s_per_iter() -> float:
    """Single-chip compute anchor: the mixed+stats per-iteration time from
    the recorded n=2000 TPU run, read from its artifact so the model stays
    consistent with the citation (fallback: last recorded value)."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scale_bench_result.json")
    try:
        with open(path) as f:
            runs = json.load(f)["runs"]
        return runs[0]["ms_per_iter"] / 1e3
    except Exception:
        return 12.4e-3


MS_PER_ITER_1CHIP = _measured_s_per_iter()


def main():
    results = {}

    # ---- compiled-HLO communication profile at north-star scale ---------
    print("analyzing compiled HLO at n=2000, T=50, r=4 ...", flush=True)
    prof_n8 = analyze_sharded_fit(2000, 50, 4, nodes=8, time_axis=1,
                                  num_blocks=8)
    prof_n4t2 = analyze_sharded_fit(2000, 50, 4, nodes=4, time_axis=2,
                                    num_blocks=8)
    results["north_star_nodes8"] = prof_n8
    results["north_star_nodes4_time2"] = prof_n4t2

    # ---- measured strong scaling on the virtual mesh --------------------
    print("measuring strong scaling at n=256 on the virtual mesh ...",
          flush=True)
    model = TemporalAMEModel(n_nodes=256, n_time=16, latent_dim=2, seed=3)
    Y, _ = model.generate_data(return_latents=True)
    init = cavi.init_state(jax.random.PRNGKey(0), 256, 16, 6, "full",
                           0.1, 0.5)

    def fit_fn(Y_s, init_s, mesh):
        out = cavi.fit_cavi(Y_s, model.params, init_s, structure="full",
                            update_mode="block", num_blocks=8,
                            max_iter=20, learning_rate=1.0, tolerance=0.0)
        jax.block_until_ready(out)

    strong = measure_scaling_efficiency(fit_fn, Y, init, [1, 2, 4, 8],
                                        repeats=3)
    results["virtual_strong_scaling_n256"] = strong

    # ---- the analytic efficiency model ----------------------------------
    # Layout: time across hosts (DCN), nodes within a host (ICI).
    dcn_bytes = sum(v["bytes"]
                    for k, v in prof_n4t2["collectives"].items()
                    if k == "collective-permute")
    ici_bytes = prof_n4t2["collective_bytes"] - dcn_bytes
    t_comp = MS_PER_ITER_1CHIP / 8
    t_ici = ici_bytes * (3 / 4) / ICI_BW     # ring all-gather (N-1)/N
    t_dcn = dcn_bytes / DCN_BW
    eff_worst = t_comp / (t_comp + t_ici + t_dcn)  # zero overlap
    results["model"] = {
        "per_iter_compute_s_8chip": t_comp,
        "ici_bytes_per_iter": ici_bytes,
        "dcn_bytes_per_iter": dcn_bytes,
        "t_ici_s": t_ici, "t_dcn_s": t_dcn,
        "efficiency_no_overlap": eff_worst,
    }

    with open("/root/repo/SCALING.json", "w") as f:
        json.dump(results, f, indent=2)

    write_md(results)
    print("wrote SCALING.md / SCALING.json", flush=True)


def write_md(res):
    p8 = res["north_star_nodes8"]
    p42 = res["north_star_nodes4_time2"]
    st = res["virtual_strong_scaling_n256"]
    m = res["model"]

    def coll_rows(prof):
        return "\n".join(
            f"| {kind} | {int(v['count'])} | {v['bytes'] / 1e6:.2f} MB |"
            for kind, v in sorted(prof["collectives"].items()))

    md = f"""# SCALING — multi-chip / multi-host evidence

Companion data: `SCALING.json` (regenerate with
`python scripts/scaling_eval.py`).  The environment has ONE real TPU chip,
so the >= 80 % multi-host criterion (BASELINE.md) is argued from the
*compiled program*: GSPMD inserts explicit collectives into the sharded
fit's HLO, and their shapes are the exact per-iteration communication
volume (`tame/parallel/comm_analysis.py`).  Single-chip compute anchor:
{MS_PER_ITER_1CHIP * 1e3:.1f} ms/iteration at the north-star config
(n=2000, T=50, r=4, Good SMF, 8-block updates —
`scale_bench_result.json`).

## Per-iteration collectives in the compiled fit (n=2000, T=50, r=4)

Mesh `nodes=8` (node axis only):

| collective | ops/iter | bytes/iter |
|---|---|---|
{coll_rows(p8)}

Mesh `nodes=4 x time=2`:

| collective | ops/iter | bytes/iter |
|---|---|---|
{coll_rows(p42)}

What they are: the all-gathers reassemble the `(n, T, r)` latent means
each block phase so every shard can run its rows of the dyad contraction
locally (the sufficient-statistics CAVI needs *means*, never the
O(n^2 T) observation tensor, across shards); the collective-permutes are
the 1-step AR(1) halo exchange on the time axis — only
{p42["collectives"].get("collective-permute", {}).get("bytes", 0) / 1e3:.0f} KB/iter.

## The multi-host layout argument

Map **time across hosts (DCN), nodes within a host (ICI)** — on a v5p-8
(2 hosts x 4 chips): all mean all-gathers then ride intra-host ICI, and
the ONLY cross-host traffic is the halo permute.

| quantity | value |
|---|---|
| compute / iter / chip (8-way) | {m["per_iter_compute_s_8chip"] * 1e3:.2f} ms |
| ICI bytes / iter | {m["ici_bytes_per_iter"] / 1e6:.1f} MB |
| DCN bytes / iter | {m["dcn_bytes_per_iter"] / 1e3:.0f} KB |
| ICI time / iter @ {ICI_BW / 1e9:.0f} GB/s | {m["t_ici_s"] * 1e3:.3f} ms |
| DCN time / iter @ {DCN_BW / 1e9:.0f} GB/s | {m["t_dcn_s"] * 1e6:.1f} us |
| efficiency, ZERO overlap | {m["efficiency_no_overlap"] * 100:.0f} % |

Even with no compute/communication overlap at all, DCN adds
{m["t_dcn_s"] * 1e6:.1f} us against {m["per_iter_compute_s_8chip"] * 1e3:.2f} ms
of per-chip compute — the multi-host (DCN) efficiency criterion is met by
~3 orders of magnitude of slack; the binding constraint is intra-host ICI
({m["t_ici_s"] * 1e3:.3f} ms, {m["t_ici_s"] / (m["per_iter_compute_s_8chip"] + m["t_ici_s"] + m["t_dcn_s"]) * 100:.0f} % of the
unoverlapped iteration), and XLA overlaps async all-gathers with the
per-phase compute in practice.  Scaling in n only widens the gap:
compute grows O(n^2 T r) while gathered means grow O(n T r).

## Multi-process runtime proof (the DCN path, actually run)

The GSPMD program above is host-count-agnostic, and the *multi-process
runtime* path is exercised for real: `python scripts/multihost_proof.py`
spawns **two OS processes** (each owning 4 CPU devices of one 8-device
global mesh), initializes them with `jax.distributed.initialize`, and
runs the full Good-SMF `fit_cavi` over the global `(nodes=4, time=2)`
sharding — the node axis crosses the process boundary, so every
per-iteration statistics reduction traverses the inter-process link
(Gloo collectives, the CPU stand-in for DCN).  Result (`MULTIHOST.json`,
regenerated by `tests/test_parallel.py::TestMultiprocessDistributed` on
every suite run): the sharded fit matches the single-process golden to
~1e-6 and the tolerance/patience stopping rule — a replicated scalar
decision — halts both processes at the same iteration.  The same
launcher (`tame.parallel.initialize_distributed`) auto-bootstraps on a
real pod slice.

## Measured strong scaling, virtual 8-device CPU mesh (n=256, T=16)

| devices | wall (s) | efficiency |
|---|---|---|
""" + "\n".join(
        f"| {c} | {v['wall_s']:.3f} | {v['efficiency']:.2f} |"
        for c, v in sorted(st.items())) + """

Caveat: the virtual devices share TWO physical CPU cores, so wall-clock
"efficiency" here measures partitioning overhead (no real parallel
hardware), not speedup — it validates that the sharded program runs and
that overhead stays bounded, nothing more.  The harness
(`tame.parallel.measure_scaling_efficiency`, strong scaling;
`measure_weak_scaling` for grown problems) is the same code a pod slice
would run.
"""
    with open("/root/repo/SCALING.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
