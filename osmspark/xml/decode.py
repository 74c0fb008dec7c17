"""OSM XML decode → same columnar model as the PBF path (parity).

Reference semantics: marook/osm-read ``lib/xmlParser.js`` — typed attribute
parsing (id/user/uid kept as strings, lat/lon parseFloat, version/changeset
int, visible bool — ``xmlParser.js:281-308``), ``<tag>``/``<nd>``/
``<member>``/``<center>``/``<bounds>`` sub-element accumulation
(``:17-171``), ISO-8601 timestamps → epoch ms. Uses the stdlib incremental
``XMLPullParser``, not a whole-file DOM (the reference buffers whole files —
``lib/libxml.js:9-23`` — which we deliberately do not reproduce).
"""

from __future__ import annotations

import datetime as dt
import xml.etree.ElementTree as ET

__all__ = ["XmlParseError", "parse_osm_xml"]


class XmlParseError(ValueError):
    """Invalid XML — routed to the error channel like xmlParser.js:190-192."""


def _ts_ms(iso: str | None) -> int | None:
    if not iso:
        return None
    t = dt.datetime.fromisoformat(iso.replace("Z", "+00:00"))
    return int(t.timestamp() * 1000)


def _info(attrs: dict) -> dict:
    return {
        "version": int(attrs["version"]) if "version" in attrs else None,
        "timestamp_ms": _ts_ms(attrs.get("timestamp")),
        "changeset": int(attrs["changeset"]) if "changeset" in attrs else None,
        "uid": attrs.get("uid"),
        "user": attrs.get("user"),
        "visible": (attrs.get("visible") == "true") if "visible" in attrs else None,
    }


def parse_osm_xml(data: bytes | str) -> dict:
    """Parse one OSM XML document → dict of entity row lists.

    Returns {"nodes": [...], "ways": [...], "relations": [...],
    "bounds": [...]} with fields matching the PBF decode output (ids as
    int64 + string form; tags dicts; ordered way refs / relation members).
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    parser = ET.XMLPullParser(events=("start", "end"))
    nodes, ways, relations, bounds = [], [], [], []
    cur = None          # current way/relation accumulator
    cur_node = None
    try:
        parser.feed(data)
        for event, el in parser.read_events():
            tag = el.tag
            if event == "start":
                if tag == "node":
                    a = el.attrib
                    cur_node = {
                        "id": int(a["id"]), "id_str": a["id"],
                        "lat": float(a["lat"]), "lon": float(a["lon"]),
                        "tags": {}, **_info(a),
                    }
                elif tag == "way":
                    a = el.attrib
                    cur = {"kind": "way", "id": int(a["id"]), "id_str": a["id"],
                           "tags": {}, "refs": [], "refs_str": [],
                           "center_lat": None, "center_lon": None, **_info(a)}
                elif tag == "relation":
                    a = el.attrib
                    cur = {"kind": "relation", "id": int(a["id"]),
                           "id_str": a["id"], "tags": {}, "members": [],
                           **_info(a)}
                elif tag == "tag":
                    t = cur_node if cur_node is not None else cur
                    if t is not None:
                        t["tags"][el.attrib["k"]] = el.attrib["v"]
                elif tag == "nd" and cur is not None:
                    cur["refs"].append(int(el.attrib["ref"]))
                    cur["refs_str"].append(el.attrib["ref"])
                elif tag == "member" and cur is not None:
                    a = el.attrib
                    cur["members"].append(
                        {"ref": a["ref"], "role": a.get("role", ""),
                         "type": a["type"]})
                elif tag == "center" and cur is not None:
                    cur["center_lat"] = float(el.attrib["lat"])
                    cur["center_lon"] = float(el.attrib["lon"])
                elif tag == "bounds":
                    a = el.attrib
                    bounds.append({k: float(a[k])
                                   for k in ("minlat", "minlon", "maxlat", "maxlon")})
            else:  # end
                if tag == "node" and cur_node is not None:
                    nodes.append(cur_node)
                    cur_node = None
                elif tag == "way" and cur is not None:
                    ways.append(cur)
                    cur = None
                elif tag == "relation" and cur is not None:
                    relations.append(cur)
                    cur = None
                el.clear()
        parser.close()
    except ET.ParseError as e:
        raise XmlParseError(str(e)) from e
    return {"nodes": nodes, "ways": ways, "relations": relations,
            "bounds": bounds}
