"""Fixed-width geo-epic file formats (S3-S7) as pure parse/format functions
usable inside ``read_text()/read_binary_files() -> map_batches`` pipelines.

Each format is a pair (parse_*(text) -> DataFrame/dict,
format_*(df/dict) -> text) that round-trips byte-compatibly with the
reference's readers/writers:

- DLY  daily weather: widths 6/4/4 + 6 per value column, optional co2
       (geoEpic/io/inputs.py:204-222 load, :267-290 save;
        fmt '%6d%4d%4d' + '%6.2f' per value)
- SOL  soil: 'ID: <n>' header, albedo+hydgrp line (8+8), layer count,
       19 property rows of 8-char floats, one column per layer
       (geoEpic/io/inputs.py:155-199 load, :52-102 save)
- SIT  site: character-offset fields — lat/lon/elev at line 3 cols
       0:8/8:16/16:24, slope_length/steep at line 4 cols 48:56/56:64
       (geoEpic/io/inputs.py:335-409)
- OPC  schedule: 2 header lines + widths [3,3,3,5,5,5,5]+[8]*8,
       fmt '%3d%3d%3d%5d%5d%5d%5d%8.3f%8.2f%8.2f%8.3f%8.2f...'
       (geoEpic/io/opc.py:17-79)
- EPIC outputs: ACY/DWC/DGN/DTP/DCS whitespace tables with skiprows
       10/10/10/10/12 and Y-M-D -> Date; ACM fixed widths [5,5,5]+[9]*24
       with its 31 hard-coded column names (geoEpic/io/outputs.py:6-168)

In a pipeline: ``ray.data.read_binary_files(paths, include_paths=True)
.map_batches(lambda b: parse_many(b, parse_dly))`` — one file per row in,
one table of parsed rows out.
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd

DLY_COLUMNS = ["year", "month", "day", "srad", "tmax", "tmin", "prcp", "rh", "ws"]

SOL_COLUMNS = [
    "Layer_depth", "Bulk_Density", "Wilting_capacity", "Field_Capacity",
    "Sand_content", "Silt_content", "N_concen", "pH", "Sum_Bases",
    "Organic_Carbon", "Calcium_Carbonate", "Cation_exchange", "Course_Fragment",
    "cnds", "pkrz", "rsd", "Bulk_density_dry", "psp", "Saturated_conductivity",
]

OPC_COLUMNS = ["Yid", "Mn", "Dy", "CODE", "TRAC", "CRP", "XMTU"] + [
    f"OPV{i}" for i in range(1, 9)
]

ACM_COLUMNS = [
    "Y", "RT#", "PRCP", "ET_pot", "ET", "Q", "SSF", "PRK", "CVF", "MUSS", "YW",
    "GMN", "NMN", "NFIX", "NITR", "AVOL", "DN", "YON", "QNO3", "SSFN", "PRKN",
    "MNP", "YP", "QAP", "PRKP", "LIME", "OCPD", "TOC", "APBC", "TAP", "TNO3",
]


# --- DLY --------------------------------------------------------------------


def parse_dly(text: str) -> pd.DataFrame:
    widths = [6, 4, 4] + [6] * 7  # incl. optional co2
    df = pd.read_fwf(io.StringIO(text), widths=widths, header=None)
    df.columns = DLY_COLUMNS + ["co2"]
    if df["co2"].isnull().all():
        df = df.drop(columns=["co2"])
    for c in ["year", "month", "day"]:
        df[c] = df[c].astype(int)
    return df


def format_dly(df: pd.DataFrame) -> str:
    df = df.drop_duplicates(subset=["year", "month", "day"])
    cols = DLY_COLUMNS + (["co2"] if "co2" in df.columns else [])
    fmt = "%6d%4d%4d" + "%6.2f" * (len(cols) - 3)
    buf = io.StringIO()
    np.savetxt(buf, df[cols].values, fmt=fmt)
    return buf.getvalue()


# --- SOL --------------------------------------------------------------------


def parse_sol(text: str) -> dict:
    lines = text.splitlines()
    try:
        soil_id = int(lines[0].strip().split(":")[1].strip())
    except (IndexError, ValueError):
        soil_id = ""
    albedo = float(lines[1][0:8].strip())
    hydgrp = {1: "A", 2: "B", 3: "C", 4: "D"}.get(int(float(lines[1][8:16].strip())), "C")
    num_layers = len(lines[3].split())
    props = [[] for _ in range(num_layers)]
    for i in range(3, 3 + 19):
        line = lines[i]
        values = [float(line[j : j + 8]) for j in range(0, len(line.strip()), 8)]
        for j, v in enumerate(values):
            if j < num_layers:
                props[j].append(v)
    layers = pd.DataFrame(props, columns=SOL_COLUMNS)
    return {
        "soil_id": soil_id,
        "albedo": albedo,
        "hydgrp": hydgrp,
        "num_layers": num_layers,
        "layers": layers,
    }


def format_sol(soil: dict, total_lines: int = 51) -> str:
    """Self-contained template (the reference fills a shipped 51-line
    template.SOL; the engine synthesizes an equivalent one)."""
    layers: pd.DataFrame = soil["layers"][SOL_COLUMNS].sort_values(
        "Layer_depth"
    ).reset_index(drop=True).fillna(0)
    n = len(layers)
    lines = [f"ID: {soil['soil_id']}"]
    hyd = {"A": 1, "B": 2, "C": 3, "D": 4}.get(soil["hydgrp"], 3)
    lines.append(f"{soil['albedo']:8.2f}{hyd:8.2f}")
    lines.append(f"{10:8.2f}")
    vals = layers.values.T
    for i in range(19):
        lines.append("".join(f"{v:8.2f}" for v in vals[i]))
    for _ in range(len(lines), total_lines - 4):
        lines.append("".join(f"{0:8.2f}" for _ in range(n)))
    lines.append("".join("       A" for _ in range(n)))  # horizon row
    for _ in range(len(lines), total_lines):
        lines.append("")
    return "\n".join(lines) + "\n"


# --- SIT --------------------------------------------------------------------


def parse_sit(text: str) -> dict:
    lines = text.splitlines(keepends=True)
    return {
        "ID": lines[2].split(":")[1].strip(),
        "lat": float(lines[3][0:8].strip()),
        "lon": float(lines[3][8:16].strip()),
        "elevation": float(lines[3][16:24].strip()),
        "slope_length": float(lines[4][48:56].strip()),
        "slope_steep": float(lines[4][56:64].strip()),
    }


def format_sit(info: dict) -> str:
    lines = [
        "Crop Simulations\n",
        "Prototype\n",
        f"ID: {info['ID']}\n",
        f"{info['lat']:8.2f}{info['lon']:8.2f}{info['elevation']:8.2f}\n",
        " " * 48 + f"{info['slope_length']:8.2f}{info['slope_steep']:8.2f}\n",
        "\n",
        " " * 51 + "\n",
    ]
    return "".join(lines)


# --- OPC --------------------------------------------------------------------


def parse_opc(text: str, start_year: int | None = None) -> tuple[pd.DataFrame, int]:
    lines = text.splitlines(keepends=True)
    header = lines[:2]
    if start_year is None:
        start_year = int(header[0].strip().split(":")[1].strip())
    widths = [3, 3, 3, 5, 5, 5, 5] + [8] * 8
    df = pd.read_fwf(io.StringIO("".join(lines[2:])), widths=widths, header=None)
    df = df.dropna().astype(float)
    df.columns = OPC_COLUMNS
    for c in OPC_COLUMNS[:7]:
        df[c] = df[c].astype(int)
    return df, start_year


def format_opc(df: pd.DataFrame, start_year: int, name: str = "rotation") -> str:
    header = f"{name} : {start_year}\n\n"
    final = df[df["Yid"] >= 1]
    fmt = "%3d%3d%3d%5d%5d%5d%5d%8.3f%8.2f%8.2f%8.3f%8.2f%8.2f%8.2f%8.2f"
    buf = io.StringIO()
    np.savetxt(buf, final[OPC_COLUMNS].values, fmt=fmt)
    return header + buf.getvalue()


# --- EPIC output tables -----------------------------------------------------

_SKIPROWS = {"ACY": 10, "DWC": 10, "DGN": 10, "DTP": 10, "DCS": 12}


def parse_epic_output(text: str, kind: str) -> pd.DataFrame:
    """ACY/DWC/DGN/DTP/DCS whitespace tables (+Date for daily kinds), ACM
    fixed-width."""
    kind = kind.upper()
    if kind == "ACM":
        # Reference quirk: outputs.py:155-161 parses widths [5,5,5]+[9]*24
        # (27 columns) then assigns 31 names — a ValueError on any input.
        # The evident intent is 31 columns: [5,5,5]+[9]*28.
        df = pd.read_fwf(io.StringIO(text), widths=[5, 5, 5] + [9] * 28)
        if df.empty:
            raise ValueError("Data is Empty")
        df.columns = ACM_COLUMNS
        return df
    df = pd.read_csv(io.StringIO(text), sep=r"\s+", skiprows=_SKIPROWS[kind])
    if df.empty:
        raise ValueError("Data is Empty")
    if kind != "ACY":
        df["Date"] = pd.to_datetime(
            df[["Y", "M", "D"]].astype(str).agg("-".join, axis=1)
        )
    return df


# --- DSL soil-water output ----------------------------------------------------


DSL_COLUMNS = ["Date"] + [f"SW{i}" for i in range(1, 16)] + ["SWavg"]


def parse_dsl(text: str) -> pd.DataFrame:
    """EPIC .DSL soil-water output: 11 header lines, then one 57-line
    block per simulated day — the date on the block's first line
    (double-space separated Y M D) and the per-layer soil-water row
    (SW1..SWn + trailing SWavg) on its 8th (geoEpic/io/sw.py:1-41).
    Returns (Date, SW1.., SWavg); empty files (<= 10 lines) return the
    empty 17-column frame exactly as the reference does."""
    lines = text.splitlines()
    if len(lines) <= 10:
        return pd.DataFrame(columns=DSL_COLUMNS)
    data = lines[11:]
    no_days = len(data) // 57
    if no_days == 0:
        # header-only file: same empty frame as the short-file case (the
        # reference would emit a Date-only frame here — normalized)
        return pd.DataFrame(columns=DSL_COLUMNS)
    dates, rows = [], []
    for i in range(no_days):
        dates.append(pd.to_datetime(data[i * 57].replace("  ", "-").strip()))
        vals = np.array(data[i * 57 + 7].split(), dtype=np.float64)
        row = {f"SW{j + 1}": v for j, v in enumerate(vals[:-1])}
        row["SWavg"] = vals[-1]
        rows.append(row)
    df = pd.DataFrame(rows)
    df.insert(0, "Date", dates)
    return df


def format_dsl(df: pd.DataFrame) -> str:
    """Inverse of ``parse_dsl``: synthesizes the 11-line header and one
    57-line day block per row (date line, 6 filler lines, the SW row,
    49 trailing filler lines) so parse(format(df)) round-trips."""
    sw_cols = [c for c in df.columns if c.startswith("SW") and c != "SWavg"]
    sw_cols = sorted(sw_cols, key=lambda c: int(c[2:]))
    out = ["DSL soil water output (synthesized)"] + [""] * 10
    for _, row in df.iterrows():
        d = pd.Timestamp(row["Date"])
        out.append(f"{d.year}  {d.month}  {d.day}")
        out.extend([""] * 6)
        vals = [row[c] for c in sw_cols] + [row["SWavg"]]
        out.append(" ".join(f"{v:10.4f}" for v in vals))
        out.extend([""] * 49)
    return "\n".join(out) + "\n"


def parse_many(batch: pd.DataFrame, parser, text_col: str = "bytes") -> pd.DataFrame:
    """Apply a per-file parser over a read_binary_files batch
    (columns: bytes, path) and concat with a source_path column."""
    frames = []
    for _, row in batch.iterrows():
        text = row[text_col].decode() if isinstance(row[text_col], bytes) else row[text_col]
        df = parser(text)
        if isinstance(df, tuple):
            df = df[0]
        if isinstance(df, dict):
            df = pd.DataFrame([df])
        df = df.copy()
        df["source_path"] = row.get("path", "")
        frames.append(df)
    return pd.concat(frames, ignore_index=True)
