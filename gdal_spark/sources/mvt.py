"""Mapbox Vector Tiles (MVT) — tile-local protobuf vector format.

Wire format re-derived from the reference's field-number constants
(/root/reference/ogr/ogrsf_frmts/mvt/mvt_tile.h: Tile.layer=3;
Layer name=1/features=2/keys=3/values=4/extent=5/version=15;
Feature id=1/tags=2/type=3/geometry=4; geom types point=1/line=2/
polygon=3; commands MoveTo=1/LineTo=2/ClosePath=7) and the public
MVT 2.1 spec: command integer = (id & 0x7) | (count << 3);
coordinates are zigzag-encoded deltas from a running cursor that
persists ACROSS geometry parts.

Protobuf primitives are shared with the OSM PBF source
(sources/osmpbf.py).
"""

from __future__ import annotations

from gdal_spark.sources.osmpbf import (
    _field,
    _iter_fields,
    _ld,
    _read_varint,
    _unzig,
    _varint,
    _zig,
)

__all__ = ["encode_mvt_tile", "decode_mvt_tile"]

GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 1, 2, 3
_CMD_MOVETO, _CMD_LINETO, _CMD_CLOSEPATH = 1, 2, 7


def _cmd(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def _encode_geometry(geom_type: int, parts: list) -> list[int]:
    """parts: list of [(x, y), ...] in tile-local integer coords.
    For polygons the CLOSING vertex must be omitted by the caller."""
    out: list[int] = []
    cx = cy = 0
    for part in parts:
        if geom_type == GEOM_POINT:
            out.append(_cmd(_CMD_MOVETO, len(part)))
            for x, y in part:
                out.append(_zig(x - cx))
                out.append(_zig(y - cy))
                cx, cy = x, y
            continue
        out.append(_cmd(_CMD_MOVETO, 1))
        x0, y0 = part[0]
        out += [_zig(x0 - cx), _zig(y0 - cy)]
        cx, cy = x0, y0
        out.append(_cmd(_CMD_LINETO, len(part) - 1))
        for x, y in part[1:]:
            out += [_zig(x - cx), _zig(y - cy)]
            cx, cy = x, y
        if geom_type == GEOM_POLYGON:
            out.append(_cmd(_CMD_CLOSEPATH, 1))
    return out


def _decode_geometry(vals: list[int], geom_type: int) -> list:
    parts: list = []
    cur: list = []
    cx = cy = 0
    i = 0
    while i < len(vals):
        c = vals[i]
        cmd_id, count = c & 0x7, c >> 3
        i += 1
        if cmd_id == _CMD_CLOSEPATH:
            if cur:
                parts.append(cur)
                cur = []
            continue
        if cmd_id == _CMD_MOVETO and cur:
            parts.append(cur)
            cur = []
        for _ in range(count):
            cx += _unzig(vals[i])
            cy += _unzig(vals[i + 1])
            i += 2
            cur.append((cx, cy))
    if cur:
        parts.append(cur)
    return parts


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _field(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _field(6, 0) + _varint(_zig(v))      # sint_value
    if isinstance(v, float):
        import struct

        return _field(3, 1) + struct.pack("<d", v)  # double_value
    return _ld(1, str(v).encode())                  # string_value


def _decode_value(buf: bytes):
    import struct

    for fid, wire, val in _iter_fields(buf):
        if fid == 1:
            return val.decode()
        if fid == 2:
            return struct.unpack("<f", val[:4])[0] if wire == 5 else val
        if fid == 3:
            return struct.unpack("<d", val[:8])[0]
        if fid in (4, 5):
            return val
        if fid == 6:
            return _unzig(val)
        if fid == 7:
            return bool(val)
    return None


def encode_mvt_tile(layers: dict, extent: int = 4096) -> bytes:
    """{layer_name: [ {id, type, parts, props}, ... ]} -> tile bytes.
    `parts` are tile-local integer rings/lines/point-lists (polygon
    rings WITHOUT the closing vertex); `props` a flat dict."""
    out = b""
    for name, feats in layers.items():
        keys: list[str] = []
        values: list = []
        kidx: dict = {}
        vidx: dict = {}
        fbufs = []
        for f in feats:
            tags: list[int] = []
            for k, v in f.get("props", {}).items():
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                vk = (type(v).__name__, v)
                if vk not in vidx:
                    vidx[vk] = len(values)
                    values.append(v)
                tags += [kidx[k], vidx[vk]]
            geom = _encode_geometry(f["type"], f["parts"])
            body = b""
            if f.get("id") is not None:
                body += _field(1, 0) + _varint(int(f["id"]))
            if tags:
                body += _ld(2, b"".join(_varint(t) for t in tags))
            body += _field(3, 0) + _varint(f["type"])
            body += _ld(4, b"".join(_varint(g) for g in geom))
            fbufs.append(body)
        layer = _ld(1, name.encode())
        for fb in fbufs:
            layer += _ld(2, fb)
        for k in keys:
            layer += _ld(3, k.encode())
        for v in values:
            layer += _ld(4, _encode_value(v))
        layer += _field(5, 0) + _varint(extent)
        layer += _field(15, 0) + _varint(2)       # version
        out += _ld(3, layer)
    return out


def decode_mvt_tile(buf: bytes) -> dict:
    """tile bytes -> {layer_name: {"extent": n, "features": [...] }}
    with each feature {id, type, parts, props}."""
    tiles: dict = {}
    for fid, _w, val in _iter_fields(bytes(buf)):
        if fid != 3:
            continue
        name = ""
        extent = 4096
        keys: list[str] = []
        values: list = []
        raw_feats = []
        for lf, _lw, lv in _iter_fields(val):
            if lf == 1:
                name = lv.decode()
            elif lf == 2:
                raw_feats.append(lv)
            elif lf == 3:
                keys.append(lv.decode())
            elif lf == 4:
                values.append(_decode_value(lv))
            elif lf == 5:
                extent = lv
        feats = []
        for fb in raw_feats:
            fid_ = None
            gtype = 0
            tags: list[int] = []
            geom: list[int] = []
            for ff, fw, fv in _iter_fields(fb):
                if ff == 1:
                    fid_ = fv
                elif ff == 2:
                    pos = 0
                    while pos < len(fv):
                        t, pos = _read_varint(fv, pos)
                        tags.append(t)
                elif ff == 3:
                    gtype = fv
                elif ff == 4:
                    pos = 0
                    while pos < len(fv):
                        g, pos = _read_varint(fv, pos)
                        geom.append(g)
            props = {
                keys[tags[i]]: values[tags[i + 1]]
                for i in range(0, len(tags), 2)
            }
            feats.append(
                {
                    "id": fid_,
                    "type": gtype,
                    "parts": _decode_geometry(geom, gtype),
                    "props": props,
                }
            )
        tiles[name] = {"extent": extent, "features": feats}
    return tiles
