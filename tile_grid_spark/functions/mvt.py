"""Mapbox Vector Tile encoder/decoder (point layers) — from scratch.

The reference enumerates and addresses tiles (/root/reference/src/tms.rs)
but never fills them; a tiling ENGINE must also produce the payloads.
Raster payloads are functions/png.py + operators/raster.py; this module
is the VECTOR side: real MVT binaries per the public Mapbox Vector Tile
spec 2.1 (protobuf wire format hand-rolled — varint/zigzag/len-delimited,
same stdlib-only philosophy as the PNG/JPEG/WAV codecs).

Scope: POINT layers (feature id + single MoveTo geometry command, tags
elided), one layer per tile. The decoder is a tolerant minimal protobuf
walker (unknown fields skipped by wire type) so tests can feed it
foreign streams. Line/polygon command streams and tag dictionaries
raise NotImplementedError at the seam.

Wire layout (MVT 2.1):
  Tile:    field 3 = repeated Layer (len-delimited)
  Layer:   15=version(=2) 1=name 5=extent 2=repeated Feature
  Feature: 1=id 3=geom_type(1=POINT) 4=packed geometry commands
  Point geometry: MoveTo(count=1) = (1<<3)|1 = 9, then zigzag(dx),
  zigzag(dy) as raw varints.
"""

from __future__ import annotations

DEFAULT_EXTENT = 4096


def _varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("varint requires non-negative")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def encode_point_tile(
    features: list[tuple[int, int, int]],
    layer_name: str = "points",
    extent: int = DEFAULT_EXTENT,
) -> bytes:
    """One MVT tile binary from [(feature_id, px, py)] with px/py in
    tile-local integer coordinates [0, extent). Features are emitted in
    the given order (sort upstream for deterministic bytes)."""
    feats = bytearray()
    for fid, px, py in features:
        if not (0 <= px < extent and 0 <= py < extent):
            raise ValueError(f"point ({px},{py}) outside extent {extent}")
        geom = _varint(9) + _varint(_zigzag(px)) + _varint(_zigzag(py))
        body = (
            _key(1, 0) + _varint(fid)
            + _key(3, 0) + _varint(1)  # POINT
            + _len_delim(4, geom)
        )
        feats += _len_delim(2, body)
    layer = (
        _key(15, 0) + _varint(2)
        + _len_delim(1, layer_name.encode())
        + _key(5, 0) + _varint(extent)
        + bytes(feats)
    )
    return _len_delim(3, layer)


def _walk(buf: bytes, pos: int, end: int):
    """Yield (field, wire, value_or_span) over one message body."""
    while pos < end:
        k = 0
        shift = 0
        while True:
            b = buf[pos]
            pos += 1
            k |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = k >> 3, k & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield field, wire, v
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield field, wire, (pos, pos + ln)
            pos += ln
        elif wire == 5:
            pos += 4  # skip fixed32
        elif wire == 1:
            pos += 8  # skip fixed64
        else:
            raise ValueError(f"unsupported wire type {wire}")


def decode_point_tile(buf: bytes) -> dict:
    """Parse one MVT tile (point layers only). Returns
    {"layers": [{"name", "extent", "version", "features":
    [(id, px, py)]}]}. Non-point geometry types raise."""
    layers = []
    for field, wire, span in _walk(buf, 0, len(buf)):
        if field != 3 or wire != 2:
            continue
        ls, le = span
        name, extent, version = "", DEFAULT_EXTENT, None
        feats = []
        for lf, lw, lv in _walk(buf, ls, le):
            if lf == 1 and lw == 2:
                name = buf[lv[0] : lv[1]].decode()
            elif lf == 5 and lw == 0:
                extent = lv
            elif lf == 15 and lw == 0:
                version = lv
            elif lf == 2 and lw == 2:
                fid, gtype, geom_span = None, None, None
                for ff, fw, fv in _walk(buf, lv[0], lv[1]):
                    if ff == 1 and fw == 0:
                        fid = fv
                    elif ff == 3 and fw == 0:
                        gtype = fv
                    elif ff == 4 and fw == 2:
                        geom_span = fv
                if gtype != 1:
                    raise NotImplementedError(
                        f"geometry type {gtype} unavailable in-sandbox (POINT only)"
                    )
                ints = []
                p = geom_span[0]
                while p < geom_span[1]:
                    v = 0
                    shift = 0
                    while True:
                        b = buf[p]
                        p += 1
                        v |= (b & 0x7F) << shift
                        shift += 7
                        if not b & 0x80:
                            break
                    ints.append(v)
                if not ints or ints[0] != 9:
                    raise ValueError("expected single MoveTo point geometry")
                feats.append((fid, _unzigzag(ints[1]), _unzigzag(ints[2])))
        layers.append(
            {"name": name, "extent": extent, "version": version, "features": feats}
        )
    return {"layers": layers}
