"""The conversion utilities (SURVEY §2.2 M1-M6): external-agency schema
→ OSM tagging, re-expressed as vectorizable per-batch transforms.

Feature representation: the engine carries GeoJSON-ish features as an
Arrow table ``(feature_id:int64, geom_type:string, coords_json:string,
props_json:string)`` — the open string→string tag map the reference
uses (docs/formats.md:9-29) serialized as JSON per row. Converters are
pure ``dict -> dict`` functions wrapped by ``make_converter`` into
``map_batches`` stages: linear, shuffle-free, trivially scalable.

Semantics mirror the reference converters (cited per function); known
reference *bugs* are intentionally not replicated and are documented
inline (e.g. trails.py:220 writes the literal key "bicyclMAINTAINERe";
roadcore.py:90-97 applies replacements to an empty string; usgs.py's
"State Hwy"/"Us Hwy" branches slice with the wrong prefix length).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

# ---------------------------------------------------------------------------
# mapping tables — semantic equivalents of utilities/mvum.yaml:1-69
# ---------------------------------------------------------------------------

ABBREVIATIONS = {
    "Cr": "Creek", "Cr.": "Creek", "Ck.": "Creek", "Crk": "Creek",
    "Cg": "Campground", "Rd": "Road", "Rd.": "Road", "Disp": "Dispersed",
    "Mt": "Mountain", "Mtn": "Mountain", "Mtn.": "Mountain", "Lk": "Lake",
    "Resvr": "Reservoir", "Spg": "Spring", "Br": "Bridge",
    "N": "North", "W": "West", "E": "East", "S": "South", "So": "South",
}

#: maintenance level digit → tag (mvum.yaml "smoothness"; level 2 also
#: implies 4wd_only=yes per mvum.py:146-161)
MAINT_LEVEL = {
    0: ("access", "unknown"), 1: ("access", "no"), 2: ("smoothness", "very_bad"),
    3: ("smoothness", "good"), 4: ("smoothness", "bad"), 5: ("smoothness", "excellent"),
}

SURFACE = {
    "NAT": "dirt", "AGG": "gravel", "AC": "gravel", "BST": "paved",
    "IMP": "compacted", "CSOIL": "compacted",
}

SYMBOL = {  # first-4-chars of SBS_SYMBOL_NAME → tag (mvum.yaml "symbol")
    "Road": ("smoothness", "very_bad"), "Pave": ("smoothness", "good"),
    "High": ("smoothness", "excellent"), "Dirt": ("surface", "dirt"),
    "Grav": ("surface", "gravel"),
}

OPERATOR = {"BLM": "Bureau Of Land Management", "FS": "Forest Service"}

SEASONAL = {"yearlong": "no", "yes": "yes", "no": "no"}


def expand_name(raw: str, abbreviations: dict | None = None) -> str:
    """Title-case + abbreviation expansion + " Road" suffix
    (mvum.py:126-144). Clean word-joining — the reference glues
    expanded words without spaces, a formatting bug not replicated."""
    abbr = ABBREVIATIONS if abbreviations is None else abbreviations
    words = [abbr.get(w, w) for w in raw.title().split()]
    name = " ".join(words)
    if " Road" not in name:
        name = f"{name} Road"
    return re.sub(r"\s+", " ", name).strip().replace("<50", "&lt;50")


def convert_mvum(props: dict, tables: dict | None = None) -> dict:
    """USFS MVUM / RoadCore → OSM (mvum.py:90-224).

    ``tables`` overrides any of the module mapping tables BY VALUE —
    the way the YAML hook must reach Ray workers: the converter closure
    pickles this dict, whereas ``apply_yaml_mapping``'s module mutation
    only affects the driver process."""
    t = tables or {}
    ABBR = t.get("ABBREVIATIONS", ABBREVIATIONS)
    MAINT = t.get("MAINT_LEVEL", MAINT_LEVEL)
    SURF = t.get("SURFACE", SURFACE)
    SYM = t.get("SYMBOL", SYMBOL)
    OPER = t.get("OPERATOR", OPERATOR)
    SEAS = t.get("SEASONAL", SEASONAL)
    fmt = "RoadCore" if "OPER_MAINT_LEVEL" in props else "MVUM"
    out: dict[str, str] = {}
    if props.get("ID") is not None:
        out["ref:usfs"] = f"FR {props['ID']}".upper()
    if props.get("NAME"):
        out["name"] = expand_name(props["NAME"], ABBR)

    key = "OPERATIONALMAINTLEVEL" if fmt == "MVUM" else "OPER_MAINT_LEVEL"
    lvl = props.get(key)
    if lvl and len(str(lvl)) > 1:
        field = str(lvl).split()[0]
        if field != "NA" and field.isdigit() and int(field) in MAINT:
            k, v = MAINT[int(field)]
            out[k] = v
            if int(field) == 2:
                out["4wd_only"] = "yes"

    maintainer = props.get("PRIMARY_MAINTAINER")
    if maintainer:
        field = str(maintainer).split()[0]
        if field in OPER:
            out["operator"] = OPER[field]
    else:
        out["operator"] = "US Forest Service"

    key = "SURFACETYPE" if fmt == "MVUM" else "SURFACE_TYPE"
    sval = props.get(key)
    if sval and sval != " " and "surface" not in out:
        field = str(sval).split()[0]
        if field in SURF:
            out["surface"] = SURF[field]

    key = "SBS_SYMBOL_NAME" if fmt == "MVUM" else "SYMBOL_NAME"
    sym = props.get(key)
    if sym and str(sym)[:4] in SYM:
        k, v = SYM[str(sym)[:4]]
        out[k] = v
        # 5-digit ref fixup (mvum.py:196-202): a 5-digit numeric ref
        # drops its 2-digit region prefix, flagged for validation
        ref_parts = out.get("ref:usfs", "").split()
        if len(ref_parts) > 1:
            ref = ref_parts[1]
            if ref.isnumeric() and len(ref) == 5 and "." not in ref:
                out["ref:usfs"] = f"FR {ref[2:]}"
                out["note"] = "Validate this changed ref!"

    key = "HIGHCLEARANCEVEHICLE" if fmt == "MVUM" else "HIGH_CLEARANCE_VEHICLE"
    if props.get(key):
        out["4wd_only"] = "yes"

    seas = props.get("SEASONAL")
    if seas and str(seas) in SEAS:
        out["seasonal"] = SEAS[str(seas)]

    out["highway"] = "unclassified"  # mvum.py:219-221
    return out


_TRLUSE_MAP = {
    "Bike": [("bicycle", "yes")], "Bicycle": [("bicycle", "yes")],
    "ATV": [("atv", "yes")], "Motorcycle": [("motorcycle", "yes")],
    "ADA": [("wheelchair", "yes")],
    "Bicycle/Motorized": [("bicycle", "yes"), ("motor_vehicle", "yes")],
    "Cross-Country Ski": [("ski", "yes")], "Dog Sled": [("dog_sled", "yes")],
    "Foot/Bicycle/Motorized": [("bicycle", "yes"), ("motor_vehicle", "yes")],
    "Snowmobile": [("snowmobile", "yes")], "Snowshoe": [("snowshoe", "yes")],
    "Horse and Hiking": [("horse", "yes")], "Horse/Hiking": [("horse", "yes")],
    "Horse, Hiking, and Bicycle": [("horse", "yes"), ("bicycle", "yes")],
    "Horse/Motorized": [("horse", "yes"), ("motor_vehicle", "yes")],
    "Motorized": [("motor_vehicle", "yes")],
    "Wheelchair Accessible Trail": [("wheelchair", "yes")],
}

_TRLSURFACE_TYPES = {"metal", "rubber", "snow", "clay", "brick", "concrete",
                     "asphalt", "wood", "sand"}

_USFS_TRAIL_ACCESS = [  # suffix rule → value (trails.py:199-226)
    ("_RESTRICTED", "no"), ("_ACCPT_DISC", "permissive"), ("_MANAGED", "designated"),
    ("_ACCPT", "yes"), ("_DISC", "discouraged"),
]

_USFS_TRAIL_KEYS = {
    "HIKER_PEDESTRIAN": "foot", "SNOWMOBILE": "snowmobile", "BICYCLE": "bicycle",
    "ATV": "atv", "MOTORCYCLE": "motorcycle", "PACK_SADDLE": "horse",
    "SNOWSHOE": "snowshoe", "XCOUNTRY_SKI": "ski",
}


def convert_trails(props: dict) -> dict:
    """NPS / USFS trails → OSM (trails.py:66-232). Defaults
    highway=path, foot=designated, bicycle=no, motor_vehicle=no
    (trails.py:84-88; the reference misspells "bicyle" in the default
    and "bicyclMAINTAINERe" in the USFS branch — corrected here)."""
    out = {"highway": "path", "foot": "designated", "bicycle": "no",
           "motor_vehicle": "no"}
    if "MAINTAINER" in props:  # NPS branch
        out["operator"] = props["MAINTAINER"]
        if props.get("TRLNAME"):
            out["name"] = props["TRLNAME"]
        if props.get("TRLALTNAME") and props["TRLALTNAME"] != "Unknown":
            out["alt_name"] = props["TRLALTNAME"].title()
        for usage in str(props.get("TRLUSE", "")).strip().split("|"):
            if not usage or usage == "Unknown":
                continue
            if usage in _TRLUSE_MAP:
                out.update(dict(_TRLUSE_MAP[usage]))
            elif usage.startswith("All-Terrain"):
                out["atv"] = "yes"
            elif "Saddle" in usage:
                out["horse"] = "yes"
            elif "Four-Wheel" in usage:
                out["4wd_only"] = "yes"
        surface = str(props.get("TRLSURFACE", "")).lower()
        if surface:
            if surface.startswith("gravel"):
                out["surface"] = "gravel"
            elif surface == "native":
                out["surface"] = "ground"
            elif surface in ("earth", "dirt", "soil"):
                out["surface"] = "dirt"
            elif surface == "aggregate":
                out["surface"] = "chipseal"
            elif surface == "bituminous":
                out["surface"] = "asphalt"
            elif surface in _TRLSURFACE_TYPES:
                out["surface"] = surface
        if props.get("SEASONAL"):
            out["seasonal"] = "yes"
        return out

    # USFS branch
    out["operator"] = "US Forest Service"
    for key, value in props.items():
        if value in (None, "N/A"):
            continue
        if key == "TRAIL_NO":
            out["ref:usfs"] = f"FR {value}".upper()
        elif key == "TRAIL_NAME":
            out["name"] = str(value).title()
        else:
            for base, tag in _USFS_TRAIL_KEYS.items():
                if key.startswith(base) and value == "Y":
                    for suffix, v in _USFS_TRAIL_ACCESS:
                        if key.endswith(suffix):
                            out[tag] = v
                            break
                    else:
                        out[tag] = "yes"
                    break
    return out


def convert_usgs(props: dict, state: str = "CO") -> dict:
    """USGS topo → OSM (usgs.py:50-213): trail branch keyed on
    ``sourceorig``, else highway branch with route-ref assembly and
    name-abbreviation expansion."""
    out: dict[str, str] = {}
    if props.get("name") is not None:
        out["name"] = props["name"]
    if "sourceorig" in props:  # trail branch (usgs.py:81-146)
        out["highway"] = "path"
        if props.get("sourceorig") is not None:
            out["source"] = props["sourceorig"]
        if props.get("trailnumbe") is not None:
            out["ref:usfs"] = str(props["trailnumbe"])
        for key, tag in (("bicycle", "bicycle"), ("atv", "atv"),
                         ("packsaddle", "horse"), ("motorcycle", "motorcycle"),
                         ("snowmobile", "snowmobile"), ("motorizedw", "motorized")):
            if props.get(key) == "Y":
                out[tag] = "designated"
        if props.get("snowshoe") == "Y":
            out["piste:type"] = "hike"
        if props.get("crosscount") == "Y":
            out["ski"] = "yes"
            out["piste:type"] = "nordic"
        return out

    # highway branch (usgs.py:148-211)
    out.setdefault("highway", "unclassified")
    if props.get("source_ori") is not None:
        out["source"] = props["source_ori"]
    for key, prefix in (("us_route_a", "US"), ("us_route", "US"),
                        ("county_rou", "US"), ("state_ro_1", state),
                        ("state_rout", state)):
        if props.get(key) is not None:
            out["ref"] = f"{prefix} {props[key]}"
    if props.get("federal_la") is not None:
        out["ref:usfs"] = f"FR {props['federal_la']}"

    name = props.get("name")
    if name is None:
        return out
    # prefix rules (usgs.py:180-199; the reference's "State Hwy"/"Us
    # Hwy" branches slice with the wrong length — intended semantics
    # implemented here)
    if name.startswith("USFS Rd "):
        out["ref:usfs"] = f"FR {name[8:]}"
    elif name.startswith("Co Rd "):
        out["ref"] = f"CR {name[6:]}"
        out["name"] = f"County Road {name[6:]}"
    elif name.startswith("Rd "):
        out["ref"] = f"CR {name[3:]}"
        out["name"] = f"County Road {name[3:]}"
    elif name.startswith("State Hwy "):
        out["ref"] = f"{state} {name[10:]}"
        out["name"] = f"State Highway {name[10:]}"
    elif name.startswith("Us Hwy "):
        out["ref"] = f"US {name[7:]}"
        out["name"] = f"US Highway {name[7:]}"
    else:
        n = name.title()
        for a, b in ((" Rd", " Road"), (" Hwy", " Highway"), (" Ln", " Lane"),
                     (" Mnt", " Mountain"), ("E ", "East "), ("W ", "West "),
                     ("N ", "North "), ("S ", "South ")):
            n = n.replace(a, b)
        out["name"] = n
    return out


def convert_nps(props: dict) -> dict:
    """NPS → OSM (nps.py:65-105): keep source/name/surface/seasonal."""
    out: dict[str, str] = {}
    if "MAPSOURCE" in props:
        out["source"] = props["MAPSOURCE"]
    if "TRLNAME" in props:
        out["name"] = str(props["TRLNAME"]).title()
    if "TRLSURFACE" in props:
        out["surface"] = str(props["TRLSURFACE"]).lower()
    if "SEASONAL" in props:
        out["seasonal"] = str(props["SEASONAL"]).lower()
    return out


def convert_roadcore(props: dict, tables: dict | None = None) -> dict:
    """RoadCore → OSM (roadcore.py:59-140). The reference's
    abbreviation pass operates on an empty string (roadcore.py:88-97, a
    bug) — intended behavior (expand then suffix) implemented here.
    ``tables`` may override MAINT_LEVEL (same by-value contract as
    convert_mvum)."""
    MAINT = (tables or {}).get("MAINT_LEVEL", MAINT_LEVEL)
    out: dict[str, str] = {}
    if "ID" in props:
        out["ref:usfs"] = f"FR {props['ID']}"
    if props.get("NAME"):
        rc_abbrev = {"Cr": "Creek", "Cg": "Campground", "Rd.": "Road",
                     "Mtn": "Mountain"}
        words = [rc_abbrev.get(w, w) for w in str(props["NAME"]).title().split()]
        name = " ".join(words)
        if "Road" not in name:
            name = f"{name} Road"
        out["name"] = name
    maint = str(props.get("OPER_MAINT") or "")[:1]
    if maint.isdigit() and int(maint) in MAINT and int(maint) != 0:
        k, v = MAINT[int(maint)]
        out[k] = v
    surface = props.get("SURFACE_TY")
    if surface:
        s = str(surface)
        if s.startswith("NAT"):
            out["surface"] = "dirt"
        if s.startswith(("IMP", "CSOIL")):
            out["surface"] = "compacted"
        elif s.startswith("AGG") or s.startswith("AC"):
            out["surface"] = "gravel"
        elif s.startswith("BST") or s.startswith("P "):
            out["surface"] = "paved"
    return out


# ---------------------------------------------------------------------------
# OSM tag janitor (M6): osmhighways.py:42-184
# ---------------------------------------------------------------------------

_REF_NUM_PAT = re.compile(r"[0-9].*")
_REF_INT_PAT = re.compile(r" [0-9]+")
_IMPORT_DEBRIS = re.compile(r"^_[A-Z]+")
_USFS_NAME_PATS = [re.compile(p) for p in (
    "fire road", r"fs.* road", r"f[sd]r ", "usfsr ", r"fs[hr] ", r"usf.* road",
    "national forest road", "forest service road", "fr ", "fs ", "forest road",
    "usfs trail ",
)]
_COUNTY_PAT = re.compile("county road")

HIGHWAY_KEEP = {  # osmhighways.py:308-320 keep-list
    "track", "unclassified", "residential", "path", "footway", "pedestrian",
    "primary", "secondary", "tertiary", "trunk", "motorway",
}


def get_ref(name: str | None) -> str | None:
    """Extract the trailing reference number from a name
    (osmhighways.py:42-75): first numeric run, spaces → dots."""
    if not name:
        return name
    m = _REF_NUM_PAT.search(name.lower())
    if m is None:
        m = _REF_INT_PAT.search(name.lower())
        if m is None:
            return name
        return m.group(0).strip().replace(" ", ".")
    res = m.group(0)
    return res if "/" in res else res.replace(" ", ".")


def filter_tags(tags: dict) -> dict:
    """Tag janitor (osmhighways.py:77-184): drop ``tiger:*`` and
    ``^_[A-Z]+`` import debris; normalize FR/FS/FSR refs into
    ``ref:usfs``; move "Forest Service Road n"-style names and county
    roads into refs."""
    name = tags.get("name")
    out: dict[str, str] = {}
    for key, val in tags.items():
        if key.startswith("tiger:") or _IMPORT_DEBRIS.match(key):
            continue
        if key in ("ref", "ref:usfs"):
            if val[:3] in ("FS ", "FR "):
                out["ref:usfs"] = val
            elif val[:4] == "FSR ":
                out["ref:usfs"] = f"FR {get_ref(val)}"
            elif key == "ref" and val[:3] == "CR ":
                out[key] = val
            else:
                ref = get_ref(name)
                if ref:
                    out["ref:usfs"] = f"FR {ref}"
            continue
        if key == "name" and name is not None:
            low = name.lower()
            if _COUNTY_PAT.match(low):
                for entry in name.split(";"):
                    ref = get_ref(entry)
                    if ref:
                        out["ref"] = f"CR {ref.title()}"
                continue
            matched = False
            for pat in _USFS_NAME_PATS:
                if pat.match(low):
                    for entry in name.split(";"):
                        ref = get_ref(entry)
                        if ref:
                            out["ref:usfs"] = f"FR {ref.title()}"
                    matched = True
                    break
            if not matched:
                out[key] = val
            continue
        out[key] = val
    return out


# ---------------------------------------------------------------------------
# batch wrappers
# ---------------------------------------------------------------------------

CONVERTERS = {
    "mvum": convert_mvum,
    "trails": convert_trails,
    "usgs": convert_usgs,
    "nps": convert_nps,
    "roadcore": convert_roadcore,
    "osm_filter_tags": filter_tags,
}


def make_converter(name: str, **kwargs):
    """``map_batches`` callable applying a converter to ``props_json``."""
    fn = CONVERTERS[name]

    def apply(t: pa.Table) -> pa.Table:
        props = [json.loads(s) if s else {} for s in t.column("props_json").to_pylist()]
        converted = [json.dumps(fn(p, **kwargs), sort_keys=True) for p in props]
        idx = t.schema.get_field_index("props_json")
        return t.set_column(idx, "props_json", pa.array(converted, pa.string()))

    return apply


def highway_class_filter(t: pa.Table, keep=frozenset(HIGHWAY_KEEP)) -> pa.Table:
    """M7 (osmhighways.py:308-327): keep features whose ``highway`` tag
    is in the keep-list."""
    import numpy as np

    props = t.column("props_json").to_pylist()
    mask = np.fromiter(
        ((json.loads(s).get("highway") in keep) if s else False for s in props),
        dtype=bool, count=len(props),
    )
    return t.filter(pa.array(mask))


# ---------------------------------------------------------------------------
# YAML mapping-file hook (yamlfile.py:28-90, utilities/mvum.yaml:1-69)
# ---------------------------------------------------------------------------

def load_yaml_mapping(path: str) -> dict:
    """Parse the reference's converter YAML shape (a list of single-key
    dicts; ``tags`` holds per-category lists of ``value: tag=value``
    pairs) into the engine's mapping tables. This is the reference's
    only declarative extension surface — users retarget a converter by
    editing YAML instead of code (VERDICT r1 missing #2).

    Returns a dict with any of the keys ABBREVIATIONS / MAINT_LEVEL /
    SURFACE / SYMBOL / OPERATOR / SEASONAL present in the file.
    """
    import yaml

    with open(path, "rb") as fh:
        doc = yaml.safe_load(fh)
    out: dict[str, dict] = {}
    for entry in doc or []:
        for key, values in entry.items():
            if key == "abbreviations":
                abbr = {}
                for item in values:
                    for k, v in item.items():
                        abbr[str(k).replace("\\", "")] = str(v)
                out["ABBREVIATIONS"] = abbr
            elif key == "tags":
                for item in values:
                    for cat, pairs in item.items():
                        flat = {}
                        for p in pairs:
                            for k, v in p.items():
                                flat[k] = v
                        if cat == "seasonal":
                            out["SEASONAL"] = {
                                str(k): str(v).split("=", 1)[1]
                                for k, v in flat.items()
                            }
                        elif cat == "smoothness":
                            out["MAINT_LEVEL"] = {
                                int(k): tuple(str(v).split("=", 1))
                                for k, v in flat.items()
                            }
                        elif cat == "symbol":
                            out["SYMBOL"] = {
                                str(k): tuple(str(v).split("=", 1))
                                for k, v in flat.items()
                            }
                        elif cat == "surface":
                            out["SURFACE"] = {
                                str(k): str(v).split("=", 1)[1]
                                for k, v in flat.items()
                            }
                        elif cat == "operator":
                            out["OPERATOR"] = {str(k): str(v) for k, v in flat.items()}
            # "columns" (field routing) is informational in the
            # reference too (marked unsupported, mvum.yaml:62-69)
    return out


def apply_yaml_mapping(path: str) -> dict:
    """Override the module mapping tables from a YAML file; returns the
    previous tables so a caller (or test) can restore them.

    DRIVER-PROCESS ONLY: Ray workers re-import the pristine module, so
    a distributed converter must receive the tables BY VALUE instead —
    ``make_converter("mvum", tables=load_yaml_mapping(path))``."""
    import sys

    mod = sys.modules[__name__]
    tables = load_yaml_mapping(path)
    prev = {k: getattr(mod, k) for k in tables}
    for k, v in tables.items():
        setattr(mod, k, v)
    return prev
