"""Mapbox Vector Tile encoder/decoder (point layers) — from scratch.

The reference enumerates and addresses tiles (/root/reference/src/tms.rs)
but never fills them; a tiling ENGINE must also produce the payloads.
Raster payloads are functions/png.py + operators/raster.py; this module
is the VECTOR side: real MVT binaries per the public Mapbox Vector Tile
spec 2.1 (protobuf wire format hand-rolled — varint/zigzag/len-delimited,
same stdlib-only philosophy as the PNG/JPEG/WAV codecs).

Scope: POINT, LINESTRING and POLYGON layers (feature id + geometry
command stream), one layer per tile, plus the spec's TAG dictionaries
on point layers (layer-level key/value tables + per-feature packed
(key_idx, value_idx) pairs; string/int64/double/bool values). The
decoder is a tolerant minimal protobuf walker (unknown fields skipped
by wire type) so tests can feed it foreign streams.

Wire layout (MVT 2.1):
  Tile:    field 3 = repeated Layer (len-delimited)
  Layer:   15=version(=2) 1=name 5=extent 2=repeated Feature
  Feature: 1=id 3=geom_type(1=POINT,2=LINESTRING,3=POLYGON)
  4=packed geometry commands.
  Command integer: (id & 0x7) | (count << 3); MoveTo=1 LineTo=2
  ClosePath=7. Point geometry: MoveTo(1), zigzag(dx), zigzag(dy).
  LineString part: MoveTo(1) + LineTo(n-1), NO ClosePath; a feature may
  carry several parts (MULTILINESTRING is the same stream repeated).
  Polygon ring: MoveTo(1) + LineTo(n-1) + ClosePath(1); deltas are
  CUMULATIVE — the cursor persists across rings and features. Vertices
  may lie outside [0, extent) (clip-buffer semantics renderers rely on);
  exterior rings wind clockwise in the y-down tile frame.
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


def _encode_value(v) -> bytes:
    """One MVT Value message (layer value-dictionary entry). Types per
    spec 2.1 §4.1: string=1, double=3, int64=4 (plain varint, two's
    complement for negatives — protobuf int64), bool=7."""
    if isinstance(v, bool):  # before int: bool is an int subclass
        return _key(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _key(4, 0) + _varint(v & 0xFFFFFFFFFFFFFFFF)
    if isinstance(v, float):
        import struct

        return _key(3, 1) + struct.pack("<d", v)
    if isinstance(v, str):
        return _len_delim(1, v.encode())
    raise TypeError(f"unsupported MVT value type {type(v).__name__}")


def _decode_value(buf: bytes, lo: int, hi: int):
    """One MVT Value message -> python value. The generic _walk skips
    fixed64 spans, so doubles (field 3, wire 1) need a manual scan."""
    import struct

    pos = lo
    while pos < hi:
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
        if wire == 1:  # fixed64
            if field == 3:
                return struct.unpack("<d", buf[pos : pos + 8])[0]
            pos += 8
        elif wire == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            if field == 4:  # int64 (two's complement)
                return v - (1 << 64) if v >= 1 << 63 else v
            if field == 7:
                return bool(v)
        elif wire == 2:  # len-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            if field == 1:
                return buf[pos : pos + ln].decode()
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wire} in Value")
    raise ValueError("empty or unsupported MVT Value message")


def encode_point_tile(
    features: list[tuple[int, int, int]],
    layer_name: str = "points",
    extent: int = DEFAULT_EXTENT,
    attrs: list[dict] | None = None,
) -> bytes:
    """One MVT tile binary from [(feature_id, px, py)] with px/py in
    tile-local integer coordinates [0, extent). Features are emitted in
    the given order (sort upstream for deterministic bytes).

    `attrs`, if given, is a parallel list of {key: value} dicts emitted
    as the spec's layer-level dictionaries (field 3 keys, field 4
    values) + per-feature packed (key_idx, value_idx) tag pairs (feature
    field 2). Dictionary order is first-seen over the emitted feature
    order with keys iterated sorted — deterministic for sorted input."""
    if attrs is not None and len(attrs) != len(features):
        raise ValueError("attrs must parallel features")
    keys: dict[str, int] = {}
    vals: dict[tuple, int] = {}  # (type_tag, value) -> idx; bool != int
    feats = bytearray()
    for i, (fid, px, py) in enumerate(features):
        if not (0 <= px < extent and 0 <= py < extent):
            raise ValueError(f"point ({px},{py}) outside extent {extent}")
        geom = _varint(9) + _varint(_zigzag(px)) + _varint(_zigzag(py))
        tags = bytearray()
        if attrs is not None and attrs[i]:
            for k in sorted(attrs[i]):
                v = attrs[i][k]
                ki = keys.setdefault(k, len(keys))
                vi = vals.setdefault((type(v).__name__, v), len(vals))
                tags += _varint(ki) + _varint(vi)
        body = bytearray(_key(1, 0) + _varint(fid))
        if tags:
            body += _len_delim(2, bytes(tags))
        body += _key(3, 0) + _varint(1)  # POINT
        body += _len_delim(4, geom)
        feats += _len_delim(2, bytes(body))
    dicts = bytearray()
    for k in keys:
        dicts += _len_delim(3, k.encode())
    for (_t, v) in vals:
        dicts += _len_delim(4, _encode_value(v))
    layer = (
        _key(15, 0) + _varint(2)
        + _len_delim(1, layer_name.encode())
        + _key(5, 0) + _varint(extent)
        + bytes(dicts)
        + bytes(feats)
    )
    return _len_delim(3, layer)


def _varint_cols(vals, max_bytes: int = 10):
    """Vectorized varint: uint64 array -> ((n, max_bytes) uint8 column
    matrix, (n,) byte lengths). Column b holds the b-th varint byte
    (7-bit group | continuation bit) or 0 when the value is shorter."""
    import numpy as np

    v = np.asarray(vals, dtype=np.uint64)
    lens = np.ones(len(v), dtype=np.int64)
    for b in range(1, max_bytes):
        lens += (v >> np.uint64(7 * b)) > 0
    cols = np.zeros((len(v), max_bytes), dtype=np.uint8)
    for b in range(max_bytes):
        grp = ((v >> np.uint64(7 * b)) & np.uint64(0x7F)).astype(np.uint8)
        cont = ((b + 1) < lens).astype(np.uint8) << 7
        cols[:, b] = np.where(b < lens, grp | cont, 0)
    return cols, lens


def encode_point_tile_np(fids, pxs, pys, layer_name: str, extent: int) -> bytes:
    """Byte-identical numpy twin of encode_point_tile for the no-attrs
    case: the feature stream is three varints per feature around fixed
    key bytes, so the whole tile encodes as a handful of vectorized
    column writes instead of per-point Python varint calls (the MVT
    production bench was spending its time in exactly that loop).
    Parity with the scalar encoder is pinned by a pytest over random
    ids/coords; callers fall back to encode_point_tile when attrs are
    present or the extent exceeds the 3-byte-varint coordinate cap."""
    import numpy as np

    if extent > (1 << 20):
        # zigzag coords would exceed the 3-byte varint columns below
        return encode_point_tile(
            list(zip(fids, pxs, pys)), layer_name, extent, attrs=None
        )
    fid = np.asarray(fids, dtype=np.int64)
    px = np.asarray(pxs, dtype=np.int64)
    py = np.asarray(pys, dtype=np.int64)
    if fid.size and fid.min() < 0:
        raise ValueError("varint requires non-negative")
    bad = (px < 0) | (px >= extent) | (py < 0) | (py >= extent)
    if bad.any():
        i = int(np.argmax(bad))  # first offender, like the scalar loop
        raise ValueError(f"point ({px[i]},{py[i]}) outside extent {extent}")
    fcols, flens = _varint_cols(fid.astype(np.uint64))
    xcols, xlens = _varint_cols((px << 1).astype(np.uint64), 3)
    ycols, ylens = _varint_cols((py << 1).astype(np.uint64), 3)
    geom_len = 1 + xlens + ylens  # varint(9) + zigzag deltas, <= 7 < 128
    body_len = (1 + flens) + 2 + 2 + geom_len
    blcols, bllens = _varint_cols(body_len.astype(np.uint64), 2)
    feat_len = 1 + bllens + body_len
    ends = np.cumsum(feat_len)
    buf = np.zeros(int(ends[-1]) if len(ends) else 0, dtype=np.uint8)
    pos = ends - feat_len

    def put(cols, lens):
        nonlocal pos
        for b in range(cols.shape[1]):
            sel = lens > b
            buf[pos[sel] + b] = cols[sel, b]
        pos = pos + lens

    buf[pos] = 0x12  # key(2, len-delim): Feature
    pos = pos + 1
    put(blcols, bllens)
    buf[pos] = 0x08  # key(1, varint): id
    pos = pos + 1
    put(fcols, flens)
    buf[pos] = 0x18  # key(3, varint): geom_type
    buf[pos + 1] = 0x01  # POINT
    buf[pos + 2] = 0x22  # key(4, len-delim): geometry
    buf[pos + 3] = geom_len.astype(np.uint8)
    buf[pos + 4] = 0x09  # MoveTo(1)
    pos = pos + 5
    put(xcols, xlens)
    put(ycols, ylens)

    layer = (
        _key(15, 0) + _varint(2)
        + _len_delim(1, layer_name.encode())
        + _key(5, 0) + _varint(extent)
        + buf.tobytes()
    )
    return _len_delim(3, layer)


def encode_poly_tile(
    features: list[tuple[int, list[list[tuple[int, int]]]]],
    layer_name: str = "polys",
    extent: int = DEFAULT_EXTENT,
) -> bytes:
    """One MVT tile binary from [(feature_id, rings)] where each ring is
    [(x, y), ...] WITHOUT the closing vertex repeated (ClosePath implies
    it). Coords are tile-local ints and MAY lie outside [0, extent) —
    the clip-buffer case. Emitted in the given order; ring 0 should be
    the exterior (clockwise in y-down)."""
    feats = bytearray()
    for fid, rings in features:
        geom = bytearray()
        cx = cy = 0  # the cursor persists across rings within a feature
        for ring in rings:
            if len(ring) < 3:
                raise ValueError(f"ring needs >= 3 vertices, got {len(ring)}")
            x0, y0 = ring[0]
            geom += _varint(9)  # MoveTo(1)
            geom += _varint(_zigzag(x0 - cx)) + _varint(_zigzag(y0 - cy))
            cx, cy = x0, y0
            geom += _varint(2 | ((len(ring) - 1) << 3))  # LineTo(n-1)
            for x, y in ring[1:]:
                geom += _varint(_zigzag(x - cx)) + _varint(_zigzag(y - cy))
                cx, cy = x, y
            geom += _varint(15)  # ClosePath(1)
        body = (
            _key(1, 0) + _varint(fid)
            + _key(3, 0) + _varint(3)  # POLYGON
            + _len_delim(4, bytes(geom))
        )
        feats += _len_delim(2, body)
    layer = (
        _key(15, 0) + _varint(2)
        + _len_delim(1, layer_name.encode())
        + _key(5, 0) + _varint(extent)
        + bytes(feats)
    )
    return _len_delim(3, layer)


def encode_line_tile(
    features: list[tuple[int, list[list[tuple[int, int]]]]],
    layer_name: str = "lines",
    extent: int = DEFAULT_EXTENT,
) -> bytes:
    """One MVT tile binary from [(feature_id, parts)] where each part is
    a polyline [(x, y), ...] with >= 2 vertices. Coords are tile-local
    ints and MAY lie outside [0, extent) (clip-buffer case). A feature
    with several parts is a MULTILINESTRING: the spec encodes it as the
    same MoveTo/LineTo stream repeated, cursor persisting across parts
    (MVT 2.1 §4.3.5.3). Emitted in the given order — sort upstream for
    deterministic bytes."""
    feats = bytearray()
    for fid, parts in features:
        geom = bytearray()
        cx = cy = 0  # cursor persists across parts within a feature
        for part in parts:
            if len(part) < 2:
                raise ValueError(f"linestring part needs >= 2 vertices, got {len(part)}")
            x0, y0 = part[0]
            geom += _varint(9)  # MoveTo(1)
            geom += _varint(_zigzag(x0 - cx)) + _varint(_zigzag(y0 - cy))
            cx, cy = x0, y0
            geom += _varint(2 | ((len(part) - 1) << 3))  # LineTo(n-1)
            for x, y in part[1:]:
                geom += _varint(_zigzag(x - cx)) + _varint(_zigzag(y - cy))
                cx, cy = x, y
        body = (
            _key(1, 0) + _varint(fid)
            + _key(3, 0) + _varint(2)  # LINESTRING
            + _len_delim(4, bytes(geom))
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


def _varints(buf: bytes, lo: int, hi: int) -> list[int]:
    ints = []
    p = lo
    while p < hi:
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
    return ints


def _parse_rings(ints: list[int]) -> list[list[tuple[int, int]]]:
    """Polygon command stream -> rings of absolute (x, y); the implied
    ClosePath vertex is not materialized."""
    rings: list[list[tuple[int, int]]] = []
    cx = cy = 0
    i = 0
    while i < len(ints):
        cmd, count = ints[i] & 0x7, ints[i] >> 3
        i += 1
        if cmd == 1:  # MoveTo(1) starts a ring
            if count != 1:
                raise ValueError(f"polygon MoveTo count {count} != 1")
            cx += _unzigzag(ints[i])
            cy += _unzigzag(ints[i + 1])
            i += 2
            rings.append([(cx, cy)])
        elif cmd == 2:  # LineTo(n)
            for _ in range(count):
                cx += _unzigzag(ints[i])
                cy += _unzigzag(ints[i + 1])
                i += 2
                rings[-1].append((cx, cy))
        elif cmd == 7:  # ClosePath
            if len(rings[-1]) < 3:
                raise ValueError("ClosePath on a ring with < 3 vertices")
        else:
            raise ValueError(f"unknown geometry command {cmd}")
    return rings


def _parse_parts(ints: list[int]) -> list[list[tuple[int, int]]]:
    """LineString command stream -> parts of absolute (x, y). Identical
    to the polygon walk minus ClosePath (which is illegal here)."""
    parts: list[list[tuple[int, int]]] = []
    cx = cy = 0
    i = 0
    while i < len(ints):
        cmd, count = ints[i] & 0x7, ints[i] >> 3
        i += 1
        if cmd == 1:  # MoveTo(1) starts a part
            if count != 1:
                raise ValueError(f"linestring MoveTo count {count} != 1")
            cx += _unzigzag(ints[i])
            cy += _unzigzag(ints[i + 1])
            i += 2
            parts.append([(cx, cy)])
        elif cmd == 2:  # LineTo(n)
            if count < 1:
                raise ValueError("linestring LineTo count must be >= 1")
            for _ in range(count):
                cx += _unzigzag(ints[i])
                cy += _unzigzag(ints[i + 1])
                i += 2
                parts[-1].append((cx, cy))
        elif cmd == 7:
            raise ValueError("ClosePath is illegal in a LINESTRING stream")
        else:
            raise ValueError(f"unknown geometry command {cmd}")
    return parts


def _decode_layers(buf: bytes) -> list[dict]:
    """Shared layer/feature walk; features kept raw as
    (fid, gtype, geometry varint list, tag varint list); layer key and
    value dictionaries decoded into "keys"/"values" lists."""
    layers = []
    for field, wire, span in _walk(buf, 0, len(buf)):
        if field != 3 or wire != 2:
            continue
        ls, le = span
        name, extent, version = "", DEFAULT_EXTENT, None
        feats = []
        keys: list[str] = []
        values: list = []
        for lf, lw, lv in _walk(buf, ls, le):
            if lf == 1 and lw == 2:
                name = buf[lv[0] : lv[1]].decode()
            elif lf == 3 and lw == 2:
                keys.append(buf[lv[0] : lv[1]].decode())
            elif lf == 4 and lw == 2:
                values.append(_decode_value(buf, lv[0], lv[1]))
            elif lf == 5 and lw == 0:
                extent = lv
            elif lf == 15 and lw == 0:
                version = lv
            elif lf == 2 and lw == 2:
                fid, gtype, geom, tags = None, None, [], []
                for ff, fw, fv in _walk(buf, lv[0], lv[1]):
                    if ff == 1 and fw == 0:
                        fid = fv
                    elif ff == 2 and fw == 2:
                        tags = _varints(buf, fv[0], fv[1])
                    elif ff == 3 and fw == 0:
                        gtype = fv
                    elif ff == 4 and fw == 2:
                        geom = _varints(buf, fv[0], fv[1])
                feats.append((fid, gtype, geom, tags))
        layers.append(
            {
                "name": name,
                "extent": extent,
                "version": version,
                "keys": keys,
                "values": values,
                "features": feats,
            }
        )
    return layers


def _tags_to_attrs(layer: dict, tags: list[int]) -> dict:
    """Packed (key_idx, value_idx) pairs -> {key: value} via the layer
    dictionaries."""
    if len(tags) % 2:
        raise ValueError("feature tags must be (key, value) index pairs")
    keys, values = layer["keys"], layer["values"]
    return {keys[tags[i]]: values[tags[i + 1]] for i in range(0, len(tags), 2)}


def decode_point_tile(buf: bytes, with_attrs: bool = False) -> dict:
    """Parse one MVT tile (point layers only). Returns
    {"layers": [{"name", "extent", "version", "keys", "values",
    "features": [(id, px, py)]}]}. With `with_attrs`, features are
    (id, px, py, {key: value}) resolved through the layer dictionaries.
    Non-point geometry types raise."""
    layers = _decode_layers(buf)
    for layer in layers:
        feats = []
        for fid, gtype, ints, tags in layer["features"]:
            if gtype != 1:
                raise NotImplementedError(
                    f"geometry type {gtype} unavailable in-sandbox (POINT only)"
                )
            if not ints or ints[0] != 9:
                raise ValueError("expected single MoveTo point geometry")
            row = (fid, _unzigzag(ints[1]), _unzigzag(ints[2]))
            if with_attrs:
                row += (_tags_to_attrs(layer, tags),)
            feats.append(row)
        layer["features"] = feats
    return {"layers": layers}


def decode_line_tile(buf: bytes) -> dict:
    """Parse one MVT tile (linestring layers only). Returns
    {"layers": [{"name", "extent", "version", "features":
    [(id, parts)]}]} with parts of absolute (x, y) vertices."""
    layers = _decode_layers(buf)
    for layer in layers:
        feats = []
        for fid, gtype, ints, _tags in layer["features"]:
            if gtype != 2:
                raise NotImplementedError(
                    f"geometry type {gtype} in a linestring layer (LINESTRING only)"
                )
            feats.append((fid, _parse_parts(ints)))
        layer["features"] = feats
    return {"layers": layers}


def decode_poly_tile(buf: bytes) -> dict:
    """Parse one MVT tile (polygon layers only). Returns
    {"layers": [{"name", "extent", "version", "features":
    [(id, rings)]}]} with rings of absolute (x, y) vertices (closing
    vertex implied, as encoded)."""
    layers = _decode_layers(buf)
    for layer in layers:
        feats = []
        for fid, gtype, ints, _tags in layer["features"]:
            if gtype != 3:
                raise NotImplementedError(
                    f"geometry type {gtype} in a polygon layer (POLYGON only)"
                )
            feats.append((fid, _parse_rings(ints)))
        layer["features"] = feats
    return {"layers": layers}
