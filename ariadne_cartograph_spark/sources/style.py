"""osm2pgsql style-file parser (SURVEY.md §1.2): the declarative
(tag key → column, datatype, geometry-kind) mapping that drives the
reference's import schema — "The style file determines *what* to
import and *where*" (`/root/reference/README.md:17,24`); uncommon tags
go to the hstore map (`README.md:25`).

The format is osm2pgsql's public ``default.style`` (shipped with
osm2pgsql; documented at osm2pgsql.org): whitespace-separated columns

    OsmType  Tag  DataType  Flags

- OsmType: ``node``, ``way`` or ``node,way`` — which element kinds the
  rule applies to;
- DataType: ``text`` / ``int4`` / ``int8`` / ``real`` — the promoted
  column's type;
- Flags (comma-separated):
  - ``linear``  — tag does NOT make a closed way an area;
  - ``polygon`` — a closed way carrying this tag becomes a polygon;
  - ``nocolumn``— never promoted to a column (map residual only);
  - ``delete``  — tag is dropped entirely before import;
  - ``phstore`` / ``nocache`` — accepted and ignored (hstore routing
    and cache hints have no analog here: the residual map already
    keeps every non-deleted, non-promoted tag).
- ``#`` starts a comment; blank lines ignored.

Deviations from osm2pgsql, documented: ``z_order`` / ``way_area`` are
computed during osm2pgsql import, not read from tags — here they parse
as ordinary rules and simply promote to null columns (no such tags
exist in OSM data); the ``--hstore-all`` / ``--hstore-match-only``
modes are not modeled.
"""

from __future__ import annotations

from dataclasses import dataclass

_DATATYPES = {"text", "int4", "int8", "real"}
_FLAGS = {"linear", "polygon", "nocolumn", "delete", "phstore", "nocache"}
_SPARK_TYPE = {"text": "string", "int4": "int", "int8": "bigint", "real": "double"}


@dataclass(frozen=True)
class StyleRule:
    """One line of an osm2pgsql style file."""

    osm_types: frozenset[str]  # subset of {"node", "way"}
    tag: str
    datatype: str  # text | int4 | int8 | real
    flags: frozenset[str]

    @property
    def column(self) -> str:
        """Promoted column name (':' → '_', the osm2pgsql convention)."""
        return self.tag.replace(":", "_")

    @property
    def spark_type(self) -> str:
        return _SPARK_TYPE[self.datatype]

    def applies_to(self, kind: str) -> bool:
        return kind in self.osm_types

    @property
    def is_deleted(self) -> bool:
        return "delete" in self.flags

    @property
    def is_column(self) -> bool:
        return not (self.flags & {"delete", "nocolumn"})

    @property
    def is_polygon(self) -> bool:
        return "polygon" in self.flags and not self.is_deleted


def parse_style(text: str) -> list[StyleRule]:
    """Parse osm2pgsql style-file text into rules. Raises ValueError on
    a malformed line (unknown OsmType / DataType / flag)."""
    rules: list[StyleRule] = []
    for lineno, raw in enumerate(text.splitlines(), start=1):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        parts = line.split()
        if len(parts) < 3:
            raise ValueError(f"style line {lineno}: need OsmType Tag DataType[ Flags]: {raw!r}")
        osm_types = frozenset(parts[0].split(","))
        if not osm_types <= {"node", "way"}:
            raise ValueError(f"style line {lineno}: bad OsmType {parts[0]!r}")
        datatype = parts[2]
        if datatype not in _DATATYPES:
            raise ValueError(f"style line {lineno}: bad DataType {datatype!r}")
        flags = frozenset(f for f in ",".join(parts[3:]).split(",") if f)
        if not flags <= _FLAGS:
            raise ValueError(
                f"style line {lineno}: bad flags {sorted(flags - _FLAGS)}"
            )
        rules.append(StyleRule(osm_types, parts[1], datatype, flags))
    return rules


def load_style(path: str) -> list[StyleRule]:
    with open(path, encoding="utf-8") as f:
        return parse_style(f.read())


# The stock osm2pgsql default.style (public, ships with osm2pgsql) —
# the exact schema the reference's import commands produce
# (`/root/reference/README.md:17` runs `-S default.style`).
DEFAULT_STYLE_TEXT = """\
# osm2pgsql default.style (stock): OsmType Tag DataType Flags
node,way   access       text  linear
node,way   addr:housename      text  linear
node,way   addr:housenumber    text  linear
node,way   addr:interpolation  text  linear
node,way   admin_level  text  linear
node,way   aerialway    text  linear
node,way   aeroway      text  polygon
node,way   amenity      text  polygon
node,way   area         text  polygon # hack
node,way   barrier      text  linear
node,way   bicycle      text  linear
node,way   brand        text  linear
node,way   bridge       text  linear
node,way   boundary     text  linear
node,way   building     text  polygon
node       capital      text  linear
node,way   construction text  linear
node,way   covered      text  linear
node,way   culvert      text  linear
node,way   cutting      text  linear
node,way   denomination text  linear
node,way   disused      text  linear
node       ele          text  linear
node,way   embankment   text  linear
node,way   foot         text  linear
node,way   generator:source    text  linear
node,way   harbour      text  polygon
node,way   highway      text  linear
node,way   historic     text  polygon
node,way   horse        text  linear
node,way   intermittent text  linear
node,way   junction     text  linear
node,way   landuse      text  polygon
node,way   layer        text  linear
node,way   leisure      text  polygon
node,way   lock         text  linear
node,way   man_made     text  polygon
node,way   military     text  polygon
node,way   motorcar     text  linear
node,way   name         text  linear
node,way   natural      text  polygon
node,way   office       text  polygon
node,way   oneway       text  linear
node,way   operator     text  linear
node,way   place        text  polygon
node,way   population   text  linear
node,way   power        text  polygon
node,way   power_source text  linear
node,way   public_transport text   polygon
node,way   railway      text  linear
node,way   ref          text  linear
node,way   religion     text  linear
node,way   route        text  linear
node,way   service      text  linear
node,way   shop         text  polygon
node,way   sport        text  polygon
node,way   surface      text  linear
node,way   toll         text  linear
node,way   tourism      text  polygon
node,way   tower:type   text  linear
way        tracktype    text  linear
node,way   tunnel       text  linear
node,way   water        text  polygon
node,way   waterway     text  polygon
node,way   wetland      text  polygon
node,way   width        text  linear
node,way   wood         text  linear
node,way   z_order      int4  linear # computed during osm2pgsql import
way        way_area     real         # computed during osm2pgsql import
node,way   source       text  delete
node,way   created_by   text  delete
node,way   note         text  delete
"""


def default_style_rules() -> list[StyleRule]:
    return parse_style(DEFAULT_STYLE_TEXT)
