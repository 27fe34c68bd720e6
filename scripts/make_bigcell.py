#!/usr/bin/env python3
"""Regenerate the 500k-row battery bench fixture (test tooling only).

The BASELINE.md battery-e2e comparison runs `graft.battery.BatteryBench`
on a 500k-row Arbin-shaped CSV: 500 cycles x 1000 rows/cycle (600 CC-charge
ramp rows, 395 plateau-shaped CC-discharge rows, 5 rest rows), capacity
fading 0.05 %/cycle so the pipeline's OLS fade slope reads exactly -0.0500
and the feature stage emits 500 rows — the same shape the round-1 numbers
(4.67 s warm @ local[4] vs pandas 4.38 s single-thread) were measured on.

Usage: python3 scripts/make_bigcell.py [/tmp/big_cell.csv]
"""
import sys

import numpy as np
import pandas as pd

N_CYCLES = 500
N_CHG, N_DIS, N_REST = 600, 395, 5
FADE = 0.0005  # 0.05 %/cycle


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/big_cell.csv"
    per_cycle = N_CHG + N_DIS + N_REST
    n = N_CYCLES * per_cycle

    cyc = np.repeat(np.arange(1, N_CYCLES + 1), per_cycle)
    scale = 1.0 - FADE * (cyc - 1)
    pos = np.tile(np.arange(per_cycle), N_CYCLES)
    is_chg = pos < N_CHG
    is_dis = (pos >= N_CHG) & (pos < N_CHG + N_DIS)
    is_rest = pos >= N_CHG + N_DIS

    step_idx = np.where(is_chg, 1, np.where(is_dis, 2, 3))
    step_name = np.where(is_chg, "CC Charge",
                         np.where(is_dis, "CC Discharge", "Rest"))

    # charge: linear V ramp 3.0 -> 4.2, cumulative capacity to 1.5*scale
    chg_i = (pos + 1) / N_CHG
    volt = np.where(is_chg, 3.0 + 1.2 * pos / (N_CHG - 1), 0.0)
    chg_cap = np.where(is_chg, 1.5 * scale * chg_i, 1.5 * scale)

    # discharge: plateau-shaped V (most capacity moves near 3.7 V, so the
    # dQ/dV argmax is a robust interior peak — the small-fixture recipe)
    df_pos = np.clip((pos - N_CHG) / (N_DIS - 1), 0.0, 1.0)
    dis_v = np.where(df_pos < 0.1, 4.15 - 3.5 * df_pos,
                     np.where(df_pos < 0.9, 3.80 - 0.15 * (df_pos - 0.1) / 0.8,
                              3.65 - 6.5 * (df_pos - 0.9)))
    # capacity fraction: slow through the plateau, fast at the knees
    dis_f = np.where(df_pos < 0.1, 0.10 * df_pos / 0.1,
                     np.where(df_pos < 0.9, 0.10 + 0.80 * (df_pos - 0.1) / 0.8,
                              0.90 + 0.10 * (df_pos - 0.9) / 0.1))
    volt = np.where(is_dis, dis_v, volt)
    volt = np.where(is_rest, 3.0, volt)
    dis_cap = np.where(is_dis, 1.45 * scale * dis_f,
                       np.where(is_rest, 1.45 * scale, 0.0))

    curr = np.where(is_chg, 1.5, np.where(is_dis, -1.5, 0.0))
    temp = np.where(is_dis, 25.5, 25.0)

    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        10 * np.arange(n), unit="s")
    df = pd.DataFrame({
        "Date_Time": ts.strftime("%Y-%m-%d %H:%M:%S"),
        "Cycle_Index": cyc, "Step_Index": step_idx, "Step_Name": step_name,
        "Current(A)": np.round(curr, 4), "Voltage(V)": np.round(volt, 4),
        "Temperature(C)": temp,
        "Charge_Capacity(Ah)": np.round(chg_cap, 6),
        "Discharge_Capacity(Ah)": np.round(dis_cap, 6)})
    df.to_csv(out, index=False)
    print(f"wrote {out}: {len(df)} rows, {N_CYCLES} cycles")


if __name__ == "__main__":
    main()
