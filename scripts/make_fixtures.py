#!/usr/bin/env python3
"""Generate deterministic vendor-CSV fixtures (FIXTURES.md F1/F2) and golden
outputs by running the UNMODIFIED reference pipeline on them (test-only
tooling; the engine itself never uses Python).

Writes fixtures + goldens into src/test/resources/.
"""
import shutil, subprocess, sys
from pathlib import Path

import numpy as np
import pandas as pd

RES = Path(__file__).resolve().parent.parent / "src/test/resources"
RES.mkdir(parents=True, exist_ok=True)
REF = Path("/root/reference")

rng = np.random.default_rng(42)


def arbin_rows(n_cycles=4, fade=0.01):
    rows = []
    t = pd.Timestamp("2024-01-01 00:00:00")
    for k in range(1, n_cycles + 1):
        scale = 1.0 - fade * (k - 1)
        chg_v = np.linspace(3.0, 4.2, 6)
        for i in range(6):  # CC charge
            rows.append([t, k, 1, "CC Charge", 1.5, round(chg_v[i], 4), 25.0,
                         round(1.5 * scale * (i + 1) / 6, 6), 0.0])
            t += pd.Timedelta(seconds=10)
        dis_i = [-1.2, -1.4, -1.5, -1.6, -1.3]
        # plateau-shaped discharge: most capacity moves near 3.7 V so the
        # dQ/dV argmax is a robust interior peak, not float noise
        dis_v = [4.15, 3.80, 3.72, 3.68, 3.00]
        dis_f = [0.10, 0.30, 0.60, 0.90, 1.00]
        for i in range(5):  # CC discharge
            rows.append([t, k, 2, "CC Discharge", dis_i[i], dis_v[i], 25.5,
                         round(1.5 * scale, 6), round(1.45 * scale * dis_f[i], 6)])
            t += pd.Timedelta(seconds=10)
        rows.append([t, k, 3, "Rest", 0.0, 3.0, 25.0,
                     round(1.5 * scale, 6), round(1.45 * scale, 6)])
        t += pd.Timedelta(seconds=10)
    return rows


def write_arbin(path):
    rows = arbin_rows()
    df = pd.DataFrame(rows, columns=[
        "Date_Time", "Cycle_Index", "Step_Index", "Step_Name", "Current(A)",
        "Voltage(V)", "Temperature(C)", "Charge_Capacity(Ah)",
        "Discharge_Capacity(Ah)"])
    # junk numeric cell (errors="coerce" → NULL) on a rest row. NOTE: only
    # temp_c is unconditionally coerced by the reference; junk in e.g.
    # Current(A) crashes it (object dtype reaches V*I, pipeline.py:176) —
    # the engine coerces every numeric column instead.
    df["Temperature(C)"] = df["Temperature(C)"].astype(object)
    df.loc[df.index[-1], "Temperature(C)"] = "junk"
    df.to_csv(path, index=False)


def write_neware(path):
    # semicolon-delimited, mV/mAh units, discharge-positive currents
    # (exercises the sign-flip heuristic, pipeline.py:131-135)
    rows = []
    t = pd.Timestamp("2024-02-01 00:00:00")
    for k in range(1, 4):
        scale = 1.0 - 0.01 * (k - 1)
        for i in range(6):
            rows.append([t, k, 1, "CC Charge", 1500.0, 3000 + 200 * i, 24.0,
                         round(1500 * scale * (i + 1) / 6, 3), 0.0])
            t += pd.Timedelta(seconds=10)
        dis_i = [1200.0, 1400.0, 1500.0, 1600.0, 1300.0]
        dis_v = [4150.0, 3800.0, 3720.0, 3680.0, 3000.0]
        dis_f = [0.10, 0.30, 0.60, 0.90, 1.00]
        for i in range(5):
            rows.append([t, k, 2, "CC Discharge", dis_i[i], dis_v[i], 24.5,
                         round(1500 * scale, 3), round(1450 * scale * dis_f[i], 3)])
            t += pd.Timedelta(seconds=10)
        rows.append([t, k, 3, "Rest", 0.0, 3000.0, 24.0,
                     round(1500 * scale, 3), round(1450 * scale, 3)])
        t += pd.Timedelta(seconds=10)
    df = pd.DataFrame(rows, columns=[
        "Record Time", "Cycle", "Step", "Mode", "Current(mA)", "Voltage(mV)",
        "NTC", "Capacity Charge(mAh)", "Capacity Discharge(mAh)"])
    # a comma-bearing remark column: makes the comma-parse raise (ragged rows)
    # so the reference's sep=";" retry actually fires (pipeline.py:21-23)
    # NOT on the first data row: a first-row extra field makes pandas infer an
    # index column instead of raising; mid-file ragged rows raise ParserError
    df["Remark"] = ["step,ok" if (i % 7 == 3) else "ok" for i in range(len(df))]
    df.to_csv(path, index=False, sep=";")


def write_timeonly(path):
    # no timestamp, no step-type column: Test_Time(s) + current-sign inference
    rows = []
    t = 0.0
    for k in range(1, 3):
        for i in range(6):
            rows.append([t, k, 1, 1.5, round(3.0 + 0.24 * i, 4),
                         round(1.5 * (i + 1) / 6, 6), 0.0])
            t += 10
        dis_i = [-1.2, -1.4, -1.5, -1.6, -1.3]
        dis_v = [4.15, 3.80, 3.72, 3.68, 3.00]
        dis_f = [0.10, 0.30, 0.60, 0.90, 1.00]
        for i in range(5):
            rows.append([t, k, 2, dis_i[i], dis_v[i],
                         1.5, round(1.45 * dis_f[i], 6)])
            t += 10
        rows.append([t, k, 3, 0.0, 3.0, 1.5, 1.45])
        t += 10
    df = pd.DataFrame(rows, columns=[
        "Test_Time(s)", "Cycle_Index", "Step_Index", "Current(A)",
        "Voltage(V)", "Charge_Capacity(Ah)", "Discharge_Capacity(Ah)"])
    df.to_csv(path, index=False)


def run_reference(csv_path, cell, rated=3.0):
    """Run the unmodified reference pipeline in a scratch dir; return
    (features_df, summary_df)."""
    work = Path("/tmp/refrun") / cell
    if work.exists():
        shutil.rmtree(work)
    work.mkdir(parents=True)
    shutil.copy(REF / "pipeline.py", work / "pipeline.py")
    # matplotlib is not installed here and plotting is out of engine scope —
    # stub it to no-ops (same methodology as BASELINE.md's measurements)
    mpl = work / "matplotlib"
    mpl.mkdir()
    (mpl / "__init__.py").write_text("def use(*a, **k):\n    pass\n")
    (mpl / "pyplot.py").write_text(
        "def _noop(*a, **k):\n    pass\n"
        + "\n".join(f"{f} = _noop" for f in
                    ["figure", "plot", "xlabel", "ylabel", "title", "grid",
                     "tight_layout", "savefig", "close"]))
    # matplotlib needs a writable config dir; plots are out of scope anyway
    import os
    env = dict(os.environ, MPLCONFIGDIR=str(work / "mpl"))
    r = subprocess.run(
        [sys.executable, "pipeline.py", "--in", str(csv_path),
         "--cell", cell, "--rated_ah", str(rated)],
        cwd=work, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout, r.stderr)
        raise SystemExit(1)
    feats = pd.read_csv(work / "data/processed" / f"{cell}_features_full.csv")
    summ = pd.read_csv(work / "data/processed" / f"{cell}_summary.csv")
    return feats, summ


def main():
    a = RES / "arbin_small.csv"
    n = RES / "neware_small.csv"
    to = RES / "timeonly_small.csv"
    write_arbin(a)
    write_neware(n)
    write_timeonly(to)
    for path, cell in [(a, "ARBIN01"), (n, "NEWARE01"), (to, "TIMEONLY01")]:
        feats, summ = run_reference(path, cell)
        feats.to_csv(RES / f"golden_{cell}_features.csv", index=False)
        summ.to_csv(RES / f"golden_{cell}_summary.csv", index=False)
        print(cell, "features:")
        print(feats.to_string())
        print(summ.to_string())


if __name__ == "__main__":
    main()
