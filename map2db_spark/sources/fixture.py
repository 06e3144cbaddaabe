"""MapsForge fixture encoder: writes small, valid map files for golden
tests.  The format is the exact inverse of the decode path (reference
map2db.py:350-728); every decoder feature is coverable: dbl / non-dbl,
debuginfo on/off, multi-subfile, multi-zoom counts, single/double
delta coordinates, all four variable-tag value types, optional
name/house/ref/elevation/label fields, empty tiles, water-flagged
index entries, multi data-block and multi coordinate-block ways.

The writer places features into explicitly chosen tiles (like
forgemap's tiling would), including coordinates slightly outside the
tile (the encode-time edge buffer) so clip semantics are exercised.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from map2db_spark.sources.primitives import (
    enc_f32,
    enc_lstr,
    enc_s16,
    enc_s32,
    enc_sleb,
    enc_u16,
    enc_u32,
    enc_u64,
    enc_uleb,
)
from map2db_spark.sources.tilemath import tile_origin_microdeg, x_from_lon, y_from_lat

MAGIC = b"mapsforge binary OSM"


def _md(deg: float) -> int:
    return int(round(deg * 1_000_000))


@dataclass
class Poi:
    lat: float
    lon: float
    zoom: int  # zoom within the subfile's range at which it first appears
    layer: int = 0
    tags: tuple[str, ...] = ()
    vtags: dict = field(default_factory=dict)  # key -> int|float|str ('%h' via Half())
    name: str | None = None
    house_num: str | None = None
    elevation: int | None = None
    pnum: int | None = None  # dbl feature id; None -> nonum feature


@dataclass
class Way:
    # blocks[data_block][coord_block] = [(lon, lat), ...]
    blocks: list
    zoom: int
    layer: int = 0
    tags: tuple[str, ...] = ()
    vtags: dict = field(default_factory=dict)
    name: str | None = None
    house_num: str | None = None
    reference: str | None = None
    label_offset: tuple[int, int] | None = None  # (dlat_md, dlon_md)
    double_delta: bool = False
    lnum: int | None = None  # dbl line id
    anum: int | None = None  # dbl area id


class Half(int):
    """Marker for %h (s16) variable-tag values."""


def _vtag_suffix(v) -> str:
    if isinstance(v, Half):
        return "=%h"
    if isinstance(v, bool):
        raise TypeError("bool vtag values unsupported")
    if isinstance(v, int):
        return "=%i"
    if isinstance(v, float):
        return "=%f"
    return "=%s"


def _enc_vtag_value(v) -> bytes:
    if isinstance(v, Half):
        return enc_s16(int(v))
    if isinstance(v, int):
        return enc_s32(v)
    if isinstance(v, float):
        return enc_f32(v)
    return enc_lstr(str(v))


class MapWriter:
    """Builds a map file from per-tile feature placements.

    subfile_zooms: list of (level, minzoom, maxzoom), ascending level.
    """

    def __init__(
        self,
        bbox: tuple[float, float, float, float],  # minlat, minlon, maxlat, maxlon
        subfile_zooms: list[tuple[int, int, int]],
        *,
        dbl_license: str | None = None,
        debuginfo: bool = False,
        comment: str | None = None,
        createdby: str | None = None,
        start: tuple[float, float, int] | None = None,  # lat, lon, zoom
        lang: str | None = None,
    ):
        self.bbox = bbox
        self.subfile_zooms = subfile_zooms
        self.dbl_license = dbl_license
        self.debuginfo = debuginfo
        self.comment = comment
        self.createdby = createdby
        self.start = start
        self.lang = lang
        # placements[sf_idx][(x, y)] = {"pois": [...], "ways": [...]}
        self.placements: list[dict] = [dict() for _ in subfile_zooms]
        self.water_tiles: set = set()  # (sf_idx, x, y) -> set water bit

    # -- placement -----------------------------------------------------

    def _slot(self, sf_idx: int, x: int, y: int) -> dict:
        return self.placements[sf_idx].setdefault((x, y), {"pois": [], "ways": []})

    def add_poi(self, sf_idx: int, x: int, y: int, poi: Poi) -> None:
        self._slot(sf_idx, x, y)["pois"].append(poi)

    def add_way(self, sf_idx: int, x: int, y: int, way: Way) -> None:
        assert not (way.lnum is not None and way.anum is not None)
        self._slot(sf_idx, x, y)["ways"].append(way)

    def mark_water(self, sf_idx: int, x: int, y: int) -> None:
        self.water_tiles.add((sf_idx, x, y))

    # -- tag dictionaries ----------------------------------------------

    def _build_tag_dicts(self) -> tuple[list[str], list[str]]:
        ptags: list[str] = []
        wtags: list[str] = []

        def intern(d: list[str], s: str) -> None:
            if s not in d:
                d.append(s)

        for placement in self.placements:
            for slot in placement.values():
                for poi in slot["pois"]:
                    for t in poi.tags:
                        intern(ptags, t)
                    for k, v in poi.vtags.items():
                        intern(ptags, k + _vtag_suffix(v))
                    if poi.pnum is not None:
                        intern(ptags, "__dbl_pnum=%i")
                for way in slot["ways"]:
                    for t in way.tags:
                        intern(wtags, t)
                    for k, v in way.vtags.items():
                        intern(wtags, k + _vtag_suffix(v))
                    if way.lnum is not None:
                        intern(wtags, "__dbl_lnum=%i")
                    if way.anum is not None:
                        intern(wtags, "__dbl_anum=%i")
        if self.dbl_license is not None:
            # the dbl marker must be the LAST way tag (map2db.py:1363)
            wtags.append("_lbd_=" + self.dbl_license[::-1])
        return ptags, wtags

    # -- feature encoding ------------------------------------------------

    @staticmethod
    def _enc_tag_block(
        tags: tuple[str, ...], vtags: dict, id_tag: tuple[str, int] | None,
        tag_dict: list[str],
    ) -> tuple[bytes, int]:
        """Tag refs + inline variable values, in tag-ref order."""
        refs: list[int] = [tag_dict.index(t) for t in tags]
        values = b""
        ordered_vtags = list(vtags.items())
        if id_tag is not None:
            ordered_vtags.append(id_tag)  # ("__dbl_pnum", 7)
        for k, v in ordered_vtags:
            entry = k if k.startswith("_lbd_") else k + _vtag_suffix(v)
            refs.append(tag_dict.index(entry))
            values += _enc_vtag_value(v)
        out = b"".join(enc_uleb(r) for r in refs) + values
        return out, len(refs)

    def _enc_poi(self, poi: Poi, origin_md, ptags: list[str]) -> bytes:
        out = b""
        if self.debuginfo:
            out += b"***POIStart" + b" " * (32 - len(b"***POIStart"))
        out += enc_sleb(_md(poi.lat) - origin_md[0])
        out += enc_sleb(_md(poi.lon) - origin_md[1])
        id_tag = ("__dbl_pnum", poi.pnum) if poi.pnum is not None else None
        tag_block, tag_count = self._enc_tag_block(poi.tags, poi.vtags, id_tag, ptags)
        assert tag_count <= 15
        out += bytes([(poi.layer + 5) * 16 + tag_count])
        out += tag_block
        flags = (
            (0x80 if poi.name is not None else 0)
            | (0x40 if poi.house_num is not None else 0)
            | (0x20 if poi.elevation is not None else 0)
        )
        out += bytes([flags])
        if poi.name is not None:
            out += enc_lstr(poi.name)
        if poi.house_num is not None:
            out += enc_lstr(poi.house_num)
        if poi.elevation is not None:
            out += enc_uleb(poi.elevation)
        return out

    def _enc_way(self, way: Way, origin_md, wtags: list[str]) -> bytes:
        body = b""
        body += enc_u16(0xFFFF)  # subtile bitmap (decoder skips it)
        if way.lnum is not None:
            id_tag = ("__dbl_lnum", way.lnum)
        elif way.anum is not None:
            id_tag = ("__dbl_anum", way.anum)
        else:
            id_tag = None
        tag_block, tag_count = self._enc_tag_block(way.tags, way.vtags, id_tag, wtags)
        assert tag_count <= 15
        body += bytes([(way.layer + 5) * 16 + tag_count])
        body += tag_block
        multiple_blocks = len(way.blocks) != 1
        flags = (
            (0x80 if way.name is not None else 0)
            | (0x40 if way.house_num is not None else 0)
            | (0x20 if way.reference is not None else 0)
            | (0x10 if way.label_offset is not None else 0)
            | (0x08 if multiple_blocks else 0)
            | (0x04 if way.double_delta else 0)
        )
        body += bytes([flags])
        if way.name is not None:
            body += enc_lstr(way.name)
        if way.house_num is not None:
            body += enc_lstr(way.house_num)
        if way.reference is not None:
            body += enc_lstr(way.reference)
        if way.label_offset is not None:
            body += enc_sleb(way.label_offset[0]) + enc_sleb(way.label_offset[1])
        if multiple_blocks:
            body += enc_uleb(len(way.blocks))
        for dblock in way.blocks:
            body += enc_uleb(len(dblock))
            for cblock in dblock:
                body += enc_uleb(len(cblock))
                lat_prev, lon_prev = origin_md
                dlat_prev = dlon_prev = 0
                for i, (lon, lat) in enumerate(cblock):
                    dlat = _md(lat) - lat_prev
                    dlon = _md(lon) - lon_prev
                    if way.double_delta and i > 1:
                        body += enc_sleb(dlat - dlat_prev)
                        body += enc_sleb(dlon - dlon_prev)
                    else:
                        body += enc_sleb(dlat)
                        body += enc_sleb(dlon)
                    dlat_prev, dlon_prev = dlat, dlon
                    lat_prev, lon_prev = _md(lat), _md(lon)
        out = b""
        if self.debuginfo:
            out += b"---WayStartX" + b" " * (32 - len(b"---WayStartX"))
        out += enc_uleb(len(body)) + body
        return out

    def _enc_tile(self, sf_idx: int, x: int, y: int, ptags, wtags) -> bytes:
        level, minzoom, maxzoom = self.subfile_zooms[sf_idx]
        slot = self.placements[sf_idx].get((x, y))
        if not slot or (not slot["pois"] and not slot["ways"]):
            return b""
        origin_md = tile_origin_microdeg(level, x, y)
        out = b""
        if self.debuginfo:
            marker = f"###TileStart{x},{y}###".encode()
            out += marker + b" " * (32 - len(marker))
        pois_by_zoom = {z: [] for z in range(minzoom, maxzoom + 1)}
        ways_by_zoom = {z: [] for z in range(minzoom, maxzoom + 1)}
        for poi in slot["pois"]:
            pois_by_zoom[poi.zoom].append(poi)
        for way in slot["ways"]:
            ways_by_zoom[way.zoom].append(way)
        for z in range(minzoom, maxzoom + 1):
            out += enc_uleb(len(pois_by_zoom[z])) + enc_uleb(len(ways_by_zoom[z]))
        poi_block = b"".join(
            self._enc_poi(p, origin_md, ptags)
            for z in range(minzoom, maxzoom + 1)
            for p in pois_by_zoom[z]
        )
        way_block = b"".join(
            self._enc_way(w, origin_md, wtags)
            for z in range(minzoom, maxzoom + 1)
            for w in ways_by_zoom[z]
        )
        out += enc_uleb(len(poi_block)) + poi_block + way_block
        return out

    # -- assembly ---------------------------------------------------------

    def tobytes(self) -> bytes:
        minlat, minlon, maxlat, maxlon = self.bbox
        ptags, wtags = self._build_tag_dicts()

        # subfile bodies (tile index + tiles), offsets resolved per subfile
        bodies = []
        for sf_idx, (level, _, _) in enumerate(self.subfile_zooms):
            minx = int(x_from_lon(level, minlon))
            maxx = int(x_from_lon(level, maxlon))
            miny = int(y_from_lat(level, maxlat))
            maxy = int(y_from_lat(level, minlat))
            x_count = maxx - minx + 1
            tiles = []
            for ty in range(miny, maxy + 1):
                for tx in range(minx, maxx + 1):
                    tiles.append((tx, ty, self._enc_tile(sf_idx, tx, ty, ptags, wtags)))
            index_size = (16 if self.debuginfo else 0) + 5 * len(tiles)
            # accumulate in lists: bytes += is O(n^2) and dominated a
            # 70k-tile encode before this fix (b"".join is linear)
            entry_parts: list[bytes] = []
            tile_parts: list[bytes] = []
            cursor = index_size
            for tx, ty, blob in tiles:
                v = cursor
                if (sf_idx, tx, ty) in self.water_tiles:
                    v |= 0x80_0000_0000  # water bit (decoder masks it off)
                entry_parts.append(v.to_bytes(5, "big"))
                tile_parts.append(blob)
                cursor += len(blob)
            body = (
                (b"+++IndexStart+++" if self.debuginfo else b"")
                + b"".join(entry_parts)
                + b"".join(tile_parts)
            )
            bodies.append(body)

        # header after the 28-byte prefix (magic + header_size + version)
        flags = (
            (0x80 if self.debuginfo else 0)
            | (0x40 if self.start is not None else 0)
            | (0x20 if self.start is not None and self.start[2] is not None else 0)
            | (0x10 if self.lang is not None else 0)
            | (0x08 if self.comment is not None else 0)
            | (0x04 if self.createdby is not None else 0)
        )
        hdr = b""
        hdr += enc_s32(_md(minlat)) + enc_s32(_md(minlon))
        hdr += enc_s32(_md(maxlat)) + enc_s32(_md(maxlon))
        hdr += enc_u16(256)  # tile pixel size
        hdr += enc_lstr("Mercator")
        hdr += bytes([flags])
        if self.start is not None:
            hdr += enc_s32(_md(self.start[0])) + enc_s32(_md(self.start[1]))
            if self.start[2] is not None:
                hdr += bytes([self.start[2]])
        if self.lang is not None:
            hdr += enc_lstr(self.lang)
        if self.comment is not None:
            hdr += enc_lstr(self.comment)
        if self.createdby is not None:
            hdr += enc_lstr(self.createdby)
        hdr += enc_u16(len(ptags)) + b"".join(enc_lstr(t) for t in ptags)
        hdr += enc_u16(len(wtags)) + b"".join(enc_lstr(t) for t in wtags)

        subfile_table = b""
        # header layout: magic(20) + header_size(4) + version(4) + file_size(8)
        # + date(8) + hdr + subfile_count(1) + 19 bytes per subfile
        prefix_len = 20 + 4 + 4 + 8 + 8
        table_len = 1 + 19 * len(self.subfile_zooms)
        data_start = prefix_len + len(hdr) + table_len
        offset = data_start
        for (level, minzoom, maxzoom), body in zip(self.subfile_zooms, bodies):
            subfile_table += bytes([level, minzoom, maxzoom])
            subfile_table += enc_u64(offset) + enc_u64(len(body))
            offset += len(body)
        file_size = offset

        out = MAGIC
        out += enc_u32(len(hdr) + table_len + 16)  # remaining header bytes
        out += enc_u32(5)  # file format version
        out += enc_u64(file_size)
        out += enc_u64(0)  # creation date
        out += hdr
        out += bytes([len(self.subfile_zooms)]) + subfile_table
        for body in bodies:
            out += body
        assert len(out) == file_size, (len(out), file_size)
        return out

    def write(self, path: str) -> str:
        with open(path, "wb") as f:
            f.write(self.tobytes())
        return path
