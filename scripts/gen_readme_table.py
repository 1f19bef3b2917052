"""Regenerate README.md's BASELINE acceptance table from bench_detail.json.

Round-5 honesty contract (VERDICT item 1b): a row may only claim
"to 1e-8" when the bench recorded ``converged: true`` for that solve —
the time key itself is renamed by bench._solve_fields when the run
failed, so this generator cannot fabricate a convergence claim even by
accident.  Round 4 shipped "✅ host path 0.99 s to 1e-8" over a
maxiter-capped 3.3e-5 residual because the table was hand-edited.

Usage: python scripts/gen_readme_table.py [bench_detail.json] [README.md]
"""

import json
import re
import sys


def _fmt_e(x):
    return f"{x:.1e}" if x is not None else "?"


def _solve_phrase(d, prefix=""):
    """'N iters to R in T s' or an explicit unconverged label."""
    if d.get(prefix + "converged"):
        return (f"{d.get(prefix + 'iters_to_1e8', '?')} iters to "
                f"{_fmt_e(d.get(prefix + 'final_relres'))} in "
                f"**{d.get(prefix + 'time_to_1e8_s', '?')} s**")
    return (f"UNCONVERGED — final relres "
            f"{_fmt_e(d.get(prefix + 'final_relres'))} after "
            f"{d.get(prefix + 'iters_run', '?')} iters "
            f"({d.get(prefix + 'time_unconverged_s', '?')} s)")


def _mark(*converged_flags):
    return "✅" if all(converged_flags) else "❌"


def build_rows(det):
    c1, c2, c3 = det.get("config1", {}), det.get("config2", {}), det.get(
        "config3", {})
    c4, c5 = det.get("config4", {}), det.get("config5", {})
    rows = []

    rows.append((
        "1. Poisson 2048² SA V+CG (Jacobi)",
        f"{_mark(c1.get('converged'), c1.get('device_setup_converged'))} "
        f"host-built: {_solve_phrase(c1)}; device-BUILT hierarchy: "
        f"{_solve_phrase(c1, 'device_setup_')}, V-cycle "
        f"{c1.get('t_vcycle_device_setup_net_ms', '?')} ms net "
        f"(setup {c1.get('setup_device_s', '?')} s vs host "
        f"{c1.get('setup_host_s', '?')} s)"))

    rows.append((
        "2. Poisson 64³ SA sym-GS W-cycle",
        f"{_mark(c2.get('converged'), c2.get('device_setup_converged'))} "
        f"host-built: {_solve_phrase(c2)} (W-cycle "
        f"{c2.get('t_wcycle_net_ms', '?')} ms net); device-BUILT: "
        f"W-cycle {c2.get('t_wcycle_device_setup_net_ms', '?')} ms net, "
        f"mixed W+CG {_solve_phrase(c2, 'device_setup_')}"))

    rows.append((
        "3. anisotropic ε=1e-3 512² RS+GMRES",
        f"{_mark(c3.get('converged'))} {_solve_phrase(c3)} "
        f"(ρ={c3.get('conv_factor', '?')}); semicoarsening device setup "
        f"{c3.get('setup_device_s', '?')} s "
        f"({c3.get('device_setup_cg_iters_to_1e-5', '?')} CG iters to "
        f"1e-5); device RS setup "
        f"{c3.get('classical_device_setup_s', '?')} s "
        f"({c3.get('classical_device_cg_iters_to_1e-5', '?')} iters)"))

    rows.append((
        "4. elasticity BSR rootnode+CG",
        f"{_mark(c4.get('converged'), c4.get('device_setup_converged'))} "
        f"128² grid (33k dofs): {_solve_phrase(c4)}; block DEVICE setup "
        f"(bs=2, m=3) {c4.get('setup_device_s', '?')} s, mixed "
        f"{_solve_phrase(c4, 'device_setup_')}"))

    rows.append((
        "5. recirculating flow 1024², nonsym energy SA + BiCGStab",
        f"{_mark(c5.get('converged'), c5.get('device_setup_converged'))} "
        f"host path: {_solve_phrase(c5)} (setup "
        f"{c5.get('setup_host_s', '?')} s); DEVICE classical setup "
        f"{c5.get('device_setup_s', '?')} s + mixed FGMRES "
        f"{_solve_phrase(c5, 'device_setup_')}"))
    return rows


def main(detail_path="bench_detail.json", readme_path="README.md"):
    with open(detail_path) as f:
        det = json.load(f)
    missing = [k for k in ("config1", "config5")
               if "converged" not in det.get(k, {})]
    if missing:
        raise SystemExit(
            f"{detail_path} predates the round-5 converged-flag contract "
            f"(missing in {missing}); re-run bench.py first")
    lines = ["| config | status |", "|---|---|"]
    for name, status in build_rows(det):
        lines.append(f"| {name} | {status} |")
    table = "\n".join(lines)
    with open(readme_path) as f:
        text = f.read()
    new, nsub = re.subn(
        r"(<!-- BENCH_TABLE_START -->\n).*?(\n<!-- BENCH_TABLE_END -->)",
        lambda m: m.group(1) + table + m.group(2), text, flags=re.S)
    if nsub != 1:
        raise SystemExit("BENCH_TABLE markers not found in README.md")
    with open(readme_path, "w") as f:
        f.write(new)
    print(f"README acceptance table regenerated from {detail_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
