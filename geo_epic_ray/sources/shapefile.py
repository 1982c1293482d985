"""Minimal pure-struct ESRI Shapefile (.shp/.dbf) reader + writer — no
GDAL/pyshp (S2: the reference reads run_info from shapefiles and converts
polygons to centroid lat/lon, geoEpic/core/workspace.py:318-326).

Supported shapes: Point (type 1) and Polygon (type 5, any ring count).
DBF: character ('C') and numeric ('N'/'F') fields. Enough for the
reference's sites/FOI flows; anything fancier was GDAL's job and is
N/A in this environment.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

SHP_POINT = 1
SHP_POLYGON = 5


def read_shp(data: bytes) -> list[dict]:
    """Parse .shp bytes -> [{type, points|rings}] per record."""
    (code,) = struct.unpack_from(">i", data, 0)
    if code != 9994:
        raise ValueError("not a shapefile")
    out = []
    off = 100
    n = len(data)
    while off + 8 <= n:
        _recno, content_len = struct.unpack_from(">ii", data, off)
        off += 8
        (stype,) = struct.unpack_from("<i", data, off)
        if stype == SHP_POINT:
            x, y = struct.unpack_from("<2d", data, off + 4)
            out.append({"type": SHP_POINT, "points": np.array([[x, y]])})
        elif stype == SHP_POLYGON:
            num_parts, num_points = struct.unpack_from("<2i", data, off + 36)
            parts = np.frombuffer(data, "<i4", num_parts, off + 44)
            pts = np.frombuffer(
                data, "<f8", num_points * 2, off + 44 + 4 * num_parts
            ).reshape(num_points, 2)
            bounds = np.concatenate([parts, [num_points]])
            rings = [pts[bounds[i] : bounds[i + 1]].copy() for i in range(num_parts)]
            out.append({"type": SHP_POLYGON, "rings": rings})
        elif stype == 0:  # null shape
            out.append({"type": 0})
        else:
            raise ValueError(f"unsupported shape type {stype}")
        off += content_len * 2
    return out


def write_shp(shapes: list[dict]) -> bytes:
    """Inverse of read_shp (testing + export)."""
    records = []
    for i, s in enumerate(shapes, start=1):
        if s["type"] == SHP_POINT:
            content = struct.pack("<i2d", SHP_POINT, *s["points"][0])
        elif s["type"] == SHP_POLYGON:
            rings = s["rings"]
            pts = np.vstack(rings)
            parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
            xs, ys = pts[:, 0], pts[:, 1]
            content = (
                struct.pack("<i4d", SHP_POLYGON, xs.min(), ys.min(), xs.max(), ys.max())
                + struct.pack("<2i", len(rings), len(pts))
                + parts.tobytes()
                + pts.astype("<f8").tobytes()
            )
        else:
            content = struct.pack("<i", 0)
        records.append(struct.pack(">2i", i, len(content) // 2) + content)
    body = b"".join(records)
    all_pts = np.vstack(
        [s["points"] if s["type"] == SHP_POINT else np.vstack(s["rings"])
         for s in shapes if s["type"] != 0]
    )
    header = struct.pack(
        ">i5ii", 9994, 0, 0, 0, 0, 0, (100 + len(body)) // 2
    ) + struct.pack(
        "<2i4d4d",
        1000, shapes[0]["type"],
        all_pts[:, 0].min(), all_pts[:, 1].min(),
        all_pts[:, 0].max(), all_pts[:, 1].max(),
        0.0, 0.0, 0.0, 0.0,
    )
    return header + body


def read_dbf(data: bytes) -> pd.DataFrame:
    """Parse .dbf bytes -> DataFrame (C/N/F fields)."""
    n_records = struct.unpack_from("<i", data, 4)[0]
    header_size, record_size = struct.unpack_from("<2h", data, 8)
    fields = []
    off = 32
    while data[off] != 0x0D:
        name = data[off : off + 11].split(b"\x00")[0].decode()
        ftype = chr(data[off + 11])
        flen = data[off + 16]
        fields.append((name, ftype, flen))
        off += 32
    rows = []
    off = header_size
    for _ in range(n_records):
        rec = data[off : off + record_size]
        pos = 1  # deletion flag
        row = {}
        for name, ftype, flen in fields:
            raw = rec[pos : pos + flen].decode(errors="replace").strip()
            if ftype in ("N", "F"):
                row[name] = float(raw) if raw not in ("", "*" * flen) else np.nan
            else:
                row[name] = raw
            pos += flen
        rows.append(row)
        off += record_size
    return pd.DataFrame(rows)


def write_dbf(df: pd.DataFrame) -> bytes:
    """Inverse of read_dbf: C fields for strings, N(18.6) for numerics."""
    fields = []
    for c in df.columns:
        if pd.api.types.is_numeric_dtype(df[c]):
            fields.append((c, "N", 18, 6))
        else:
            w = max(1, min(254, int(df[c].astype(str).str.len().max() or 1)))
            fields.append((c, "C", w, 0))
    record_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    out = [
        struct.pack(
            "<4B i 2h 20x", 3, 24, 1, 1, len(df), header_size, record_size
        )
    ]
    for name, ftype, flen, dec in fields:
        out.append(
            name.encode()[:10].ljust(11, b"\x00")
            + ftype.encode()
            + b"\x00" * 4
            + bytes([flen, dec])
            + b"\x00" * 14
        )
    out.append(b"\x0d")
    for _, row in df.iterrows():
        rec = [b" "]
        for name, ftype, flen, dec in fields:
            v = row[name]
            if ftype == "N":
                rec.append(f"{float(v):>{flen}.{dec}f}".encode()[:flen])
            else:
                rec.append(str(v).encode()[:flen].ljust(flen))
        out.append(b"".join(rec))
    out.append(b"\x1a")
    return b"".join(out)


def shp_to_sites(shp_bytes: bytes, dbf_bytes: bytes | None = None) -> pd.DataFrame:
    """The reference's run_info SHP flow (workspace.py:318-326): geometry
    -> centroid -> (lat, lon) columns, attributes joined, geometry
    dropped."""
    from ..geo.geometry import polygon_centroid

    shapes = read_shp(shp_bytes)
    lats, lons = [], []
    for s in shapes:
        if s["type"] == SHP_POINT:
            lon, lat = s["points"][0]
        elif s["type"] == SHP_POLYGON:
            lon, lat = polygon_centroid(s["rings"])
        else:
            lon = lat = np.nan
        lats.append(lat)
        lons.append(lon)
    df = read_dbf(dbf_bytes) if dbf_bytes is not None else pd.DataFrame(index=range(len(shapes)))
    df["lat"] = lats
    df["lon"] = lons
    return df
