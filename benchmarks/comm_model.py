"""Analytic ICI communication model for every sharded path (round 4).

VERDICT r3 item 6: the ≥85% weak-scaling target (BASELINE.md) cannot be
measured on this runner (one tunneled v5e chip), so this model turns it
into a FALSIFIABLE prediction: per sharded path, bytes over ICI per device
per call as a formula (imported from the same package code that builds the
collectives, so the numbers cannot drift from the implementation), a
latency+bandwidth cost model, and the predicted weak-scaling efficiency on
a v5e ICI ring. Real multi-chip hardware can later confirm or refute the
table row by row.

Cost model (published v5e numbers, jax-ml.github.io/scaling-book):
    t_comm(V bytes, h hops) = h * LAT + V / BW_ICI
    E(D) = t_comp / (t_comp + t_exposed_comm)
with BW_ICI = 4.5e10 B/s one-way per link (v5e), LAT = 1e-6 s per hop,
t_comp = n_local / R_chip using the MEASURED single-chip rates from
BENCH_NOTES (not theoretical peaks). The fused-ring path overlaps its halo
DMA with interior tiles, so only max(0, t_comm - t_interior) is exposed.

Usage: python benchmarks/comm_model.py   (writes WEAKSCALING_MODEL.json)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

# --- v5e constants (public) --------------------------------------------------
BW_ICI = 4.5e10  # one-way per-link ICI, B/s (scaling book, v5e)
LAT_HOP = 1e-6  # per collective STEP latency, s (software + neighbor link)
# routed transit for a ppermute that crosses s physical links in one step:
# ICI is cut-through routed, so extra distance adds propagation/router time,
# not another software step. 0.1 us/hop is the conservative placeholder the
# ladder rows use (a 10x error here still keeps the ladder ahead of the
# (D-1)-step all_gather at D=256).
LAT_ROUTE = 1e-7
BW_DCN_PESSIMISTIC = 6.25e9  # B/s per chip if shards cross DCN, not ICI

# --- measured single-chip rates (BENCH_NOTES, samples/s) ---------------------
R_WINDOWED = 77.1e9  # carry-free windowed averager, k=1024 stereo int16
R_SCAN = 25.1e9  # fused blelloch scan averager
R_CHAIN = 15.0e9  # 16-ch FM receiver chain, fused frontend (aggregate)
R_FIR = 25.8e9  # 257-tap lane-blocked FIR, 16x4.2M f32


def path_models():
    """Per-path (bytes, hops, rate, overlap) formulas.

    Each entry: name -> dict with
      volume(n_loc, D): ICI bytes sent per device per call
      hops(D): serialized hops on the critical path
      rate: measured single-chip samples/s
      overlapped: True if the path hides comm behind interior compute
    All volume formulas import the package's own halo math so the model
    tracks the implementation.
    """
    from digital_signal_processsing_tpu.models import ChainConfig, DspChain
    from digital_signal_processsing_tpu.ops.pallas_scan import (
        packed_tail_rows,
        windowed_tail_rows,
    )
    from digital_signal_processsing_tpu.parallel.pipeline import chain_halo

    K, C = 1024, 2  # the headline averager config
    tail_b = windowed_tail_rows(K, C) * 128 * 2  # int16 raw halo
    packed_b = packed_tail_rows(K, C) * 128 * 4  # int32 pair words

    chain = DspChain(ChainConfig(channels=16, decimation=8))
    halo_c = chain_halo(chain)  # raw complex samples per channel

    return {
        # one right-shift ppermute of the raw int16 tail, 1 hop
        "windowed_ppermute_halo": dict(
            volume=lambda n_loc, D: tail_b,
            hops=lambda D: 1,
            rate=R_WINDOWED,
            overlapped=False,
            formula=f"windowed_tail_rows({K},{C})*128*2 = {tail_b} B",
        ),
        # same bytes in int32 pair words
        "windowed_packed_halo": dict(
            volume=lambda n_loc, D: packed_b,
            hops=lambda D: 1,
            rate=R_WINDOWED,
            overlapped=False,
            formula=f"packed_tail_rows({K},{C})*128*4 = {packed_b} B",
        ),
        # in-kernel RDMA overlapped with interior tiles
        "windowed_fused_ring": dict(
            volume=lambda n_loc, D: tail_b,
            hops=lambda D: 1,
            rate=R_WINDOWED,
            overlapped=True,
            formula=f"same {tail_b} B, started at grid step 0",
        ),
        # round-5 DEFAULT: log-depth ppermute doubling ladder
        # (parallel/sharded_scan._carry_exclusive, impl='ladder') —
        # ceil(log2 D) dependent collective steps; round i's ppermute
        # routes 2^i physical links (cut-through), so distance costs
        # LAT_ROUTE per link, not another software step. + 1 halo ppermute.
        "scan_carry_ladder": dict(
            volume=lambda n_loc, D: (D - 1) * C * 4 + K * C * 4,
            hops=lambda D: (D - 1).bit_length() + 1,  # ceil(log2 D) + 1
            route_hops=lambda D: D - 1,
            rate=R_SCAN,
            overlapped=False,
            formula=f"(D-1)*{C}*4 (ladder hop-bytes) + {K}*{C}*4 "
            "(cumsum tail) B; ceil(log2 D)+1 steps",
        ),
        # the r2-r4 spelling, kept as carry_impl='allgather' anchor:
        # all_gather of (C,) int32 totals (ring: D-1 steps) + k*C tail
        "scan_carry_allgather": dict(
            volume=lambda n_loc, D: D * C * 4 + K * C * 4,
            hops=lambda D: D,  # (D-1) all_gather steps + 1 halo ppermute
            rate=R_SCAN,
            overlapped=False,
            formula=f"D*{C}*4 (all_gather totals) + {K}*{C}*4 (cumsum tail) B",
        ),
        # one combined complex64 halo covering the whole chain
        "chain_combined_halo": dict(
            volume=lambda n_loc, D: 16 * halo_c * 8,
            hops=lambda D: 1,
            rate=R_CHAIN,
            overlapped=False,
            formula=f"16ch * chain_halo={halo_c} * 8 B (complex64) "
            f"= {16 * halo_c * 8} B",
        ),
        # overlap-save FIR: (k-1) f32 per channel row
        "fir_overlap_save_halo": dict(
            volume=lambda n_loc, D: 16 * 256 * 4,
            hops=lambda D: 1,
            rate=R_FIR,
            overlapped=False,
            formula="16ch * (257-1) * 4 B = 16384 B",
        ),
    }


def predict(n_loc: int, D: int, bw: float = BW_ICI) -> list[dict]:
    rows = []
    for name, m in path_models().items():
        t_comp = n_loc / m["rate"]
        t_comm = m["hops"](D) * LAT_HOP + m["volume"](n_loc, D) / bw
        if "route_hops" in m:
            t_comm += m["route_hops"](D) * LAT_ROUTE
        if m["overlapped"]:
            # interior tiles (all but the rotated-to-last one) hide the DMA;
            # conservatively assume the last tile is 1/8 of the shard
            t_interior = t_comp * 7 / 8
            t_exposed = max(0.0, t_comm - t_interior)
        else:
            t_exposed = t_comm
        eff = t_comp / (t_comp + t_exposed)
        rows.append(
            dict(
                path=name,
                n_local=n_loc,
                devices=D,
                bytes_per_call=int(m["volume"](n_loc, D)),
                hops=m["hops"](D),
                t_comp_us=round(t_comp * 1e6, 2),
                t_comm_us=round(t_comm * 1e6, 3),
                t_exposed_us=round(t_exposed * 1e6, 3),
                predicted_efficiency=round(eff, 4),
                formula=m["formula"],
            )
        )
    return rows


def main() -> None:
    out = {
        "model": "E(D) = t_comp/(t_comp + exposed(h*LAT + V/BW)); "
        "t_comp = n_local / measured_single_chip_rate",
        "constants": {
            "BW_ICI_oneway_Bps": BW_ICI,
            "LAT_per_hop_s": LAT_HOP,
            "BW_DCN_pessimistic_Bps": BW_DCN_PESSIMISTIC,
            "rates_samples_per_s": {
                "windowed": R_WINDOWED,
                "scan": R_SCAN,
                "chain": R_CHAIN,
                "fir": R_FIR,
            },
        },
        "note": "volumes computed from the package's own halo math "
        "(windowed_tail_rows/packed_tail_rows/chain_halo); falsifiable on "
        "real multi-chip hardware by timing one sharded call per row",
        "predictions": [],
    }
    print("| path | n_loc | D | bytes | t_comp us | t_comm us | E |")
    print("|---|---|---|---|---|---|---|")
    for n_loc in (512_000, 1_000_000, 8_000_000):
        for D in (2, 8, 16, 256):
            for r in predict(n_loc, D):
                out["predictions"].append(r)
                print(
                    f"| {r['path']} | {n_loc} | {D} | {r['bytes_per_call']} "
                    f"| {r['t_comp_us']} | {r['t_comm_us']} "
                    f"| {r['predicted_efficiency']} |"
                )
    # the DCN-pessimistic bound at the BASELINE 2-host config
    out["dcn_rows"] = predict(8_000_000, 2, bw=BW_DCN_PESSIMISTIC)
    # headline over the DEFAULT dispatch paths at the BASELINE config
    # (>=2 hosts = >=16 v5e chips); scan_carry is the explicit-carry anchor,
    # not the default — its (D-1)-hop all_gather latency wall at D=256 is
    # exactly why the carry-free windowed path is the default
    default_paths = {
        "windowed_ppermute_halo",
        "windowed_fused_ring",
        "chain_combined_halo",
        "fir_overlap_save_halo",
    }
    floor = min(
        r["predicted_efficiency"]
        for r in out["predictions"]
        if r["n_local"] >= 1_000_000 and r["path"] in default_paths
    )
    scan_256 = min(
        r["predicted_efficiency"]
        for r in out["predictions"]
        if r["path"] == "scan_carry_allgather" and r["devices"] == 256
    )
    ladder_256_8m = next(
        r["predicted_efficiency"]
        for r in out["predictions"]
        if r["path"] == "scan_carry_ladder"
        and r["devices"] == 256
        and r["n_local"] == 8_000_000
    )
    out["headline"] = (
        f"every DEFAULT sharded path at n_local >= 1M samples predicts "
        f"efficiency >= {floor:.3f} at any tested mesh size (2..256 chips) "
        "on a v5e ICI ring — the >=85% BASELINE >=2-host target holds with "
        "margin. The explicit scan-carry path now defaults to the log-depth "
        f"ppermute ladder (round 5): {ladder_256_8m:.2f} predicted at 256 "
        f"chips / 8M local, vs the all_gather anchor's {scan_256:.2f} "
        "latency wall — and the carry-free windowed kernel remains the "
        "dispatch default above both."
    )
    print(out["headline"])
    with open("WEAKSCALING_MODEL.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote WEAKSCALING_MODEL.json")


if __name__ == "__main__":
    main()
