"""Biolink-model-derived dimension tables (VERDICT r5 item 3).

The reference derives its predicate/category hierarchy knowledge from the
bmt Toolkit at runtime (orion/biolink_utils.py:44-80 — leaf reduction,
valid node types, predicate inversion; orion/redundant_kg.py:28-31 —
ancestor-predicate closure; qualifier detection via bmt.is_qualifier).
This module replaces that service dependency with a driver-side builder
over the PUBLIC biolink-model YAML (the LinkML schema published at
biolink/biolink-model): parse once, emit small dimension DataFrames, and
let every derived-graph operator (H1/H2/H4 in operators/derive.py) consume
them as broadcastable dims.

Spark-first rationale: the hierarchy is a few thousand rows — a classic
broadcast dimension. Deriving it eagerly into closure TABLES (term,
ancestor) turns the reference's per-edge bmt lookups into one broadcast
hash join per derived-graph pass; the 100 TB edge side never calls
Python.

Versioning mirrors the norm-map contract: `model_version` is the YAML's
declared ``version:`` plus a content hash, so dims are content-addressed
like any other pipeline input.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import yaml

_SUBSET_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "biolink_model_subset.yaml",
)


def pred_curie(name: str) -> str:
    """Slot name -> biolink CURIE: 'has part' -> 'biolink:has_part'
    (bmt's formatted snake_case convention)."""
    if name.startswith("biolink:"):
        return name
    return "biolink:" + name.strip().replace(",", "").replace(" ", "_").lower()


def class_curie(name: str) -> str:
    """Class name -> biolink CURIE: 'named thing' -> 'biolink:NamedThing'
    (CamelCase preserving in-word capitals, e.g. 'RNA product' ->
    'biolink:RNAProduct')."""
    if name.startswith("biolink:"):
        return name
    words = name.strip().replace(",", "").split()
    return "biolink:" + "".join(w[0].upper() + w[1:] for w in words)


@dataclass
class BiolinkModel:
    """Parsed LinkML schema: slots (predicates + qualifiers) and classes
    (categories), each with is_a / mixins / inverse / symmetric."""

    slots: dict = field(default_factory=dict)
    classes: dict = field(default_factory=dict)
    version: str = ""
    content_hash: str = ""

    @property
    def model_version(self) -> str:
        """Content-addressed version (norm-map style): declared version +
        schema content hash."""
        return f"{self.version or 'unversioned'}-{self.content_hash}"

    # -- hierarchy walks ---------------------------------------------------

    def _ancestors(self, name: str, table: dict) -> list[str]:
        """Transitive is_a + mixins ancestors, excluding self, first-seen
        order (bmt get_ancestors(mixin=True, reflexive=False))."""
        out: list[str] = []
        seen = {name}
        frontier = [name]
        while frontier:
            cur = table.get(frontier.pop(0)) or {}
            parents = []
            if cur.get("is_a"):
                parents.append(cur["is_a"])
            parents.extend(cur.get("mixins") or [])
            for p in parents:
                if p not in seen:
                    seen.add(p)
                    out.append(p)
                    frontier.append(p)
        return out

    def predicate_ancestors(self, name: str) -> list[str]:
        return self._ancestors(name, self.slots)

    def class_ancestors(self, name: str) -> list[str]:
        return self._ancestors(name, self.classes)

    def is_qualifier(self, name: str) -> bool:
        """bmt.is_qualifier parity: the slot or one of its ancestors is the
        'qualifier' meta-slot (orion/redundant_kg.py:35-39 consumers)."""
        if name not in self.slots:
            return False
        return name == "qualifier" or "qualifier" in self._ancestors(
            name, self.slots
        )

    def is_symmetric(self, name: str) -> bool:
        return bool((self.slots.get(name) or {}).get("symmetric"))

    def invert_predicate(self, curie: str) -> str | None:
        """orion/biolink_utils.py:69-80: symmetric -> itself; declared
        inverse -> its CURIE; else None."""
        name = _slot_name(self, curie)
        if name is None:
            return None
        if self.is_symmetric(name):
            return pred_curie(name)
        inv = (self.slots.get(name) or {}).get("inverse")
        return pred_curie(inv) if inv else None

    def find_leaves(self, curies: set[str]) -> set[str]:
        """orion/biolink_utils.py:44-61: drop every concept that is an
        ancestor of another concept in the set; unknown concepts drop."""
        by_curie = {class_curie(n): n for n in self.classes}
        ancestry: set[str] = set()
        known: set[str] = set()
        for c in curies:
            name = by_curie.get(c)
            if name is None:
                continue
            known.add(c)
            ancestry.update(class_curie(a) for a in self.class_ancestors(name))
        return known - ancestry

    def valid_node_types(self, root: str = "named thing") -> frozenset[str]:
        """orion/biolink_utils.py:62-67: descendants of NamedThing,
        reflexive, as CURIEs."""
        out = {class_curie(root)}
        for name in self.classes:
            if root in self.class_ancestors(name):
                out.add(class_curie(name))
        return frozenset(out)

    # -- dimension rows ----------------------------------------------------

    def predicate_closure_rows(self) -> list[tuple[str, str, bool, str | None]]:
        """(term, ancestor, is_symmetric, inverse) — one row per proper
        ancestor of each non-qualifier slot (orion/redundant_kg.py:28-31's
        get_ancestor_predicates, materialized). Slots with no ancestors
        (the hierarchy roots) emit nothing: the closure join is a no-op for
        them by construction."""
        rows = []
        for name in self.slots:
            if self.is_qualifier(name):
                continue
            inv = (self.slots[name] or {}).get("inverse")
            for anc in self.predicate_ancestors(name):
                rows.append(
                    (
                        pred_curie(name),
                        pred_curie(anc),
                        self.is_symmetric(name),
                        pred_curie(inv) if inv else None,
                    )
                )
        return rows

    def category_closure_rows(self) -> list[tuple[str, str]]:
        """(term, ancestor) over classes — the leaf-reduction dim
        (orion/biolink_utils.py:44-61 materialized)."""
        return [
            (class_curie(name), class_curie(anc))
            for name in self.classes
            for anc in self.class_ancestors(name)
        ]

    def qualifier_slots(self) -> list[str]:
        """Snake-case qualifier property names (bmt.is_qualifier sweep)."""
        return sorted(
            n.replace(" ", "_")
            for n in self.slots
            if n != "qualifier" and self.is_qualifier(n)
        )


def _slot_name(model: BiolinkModel, curie: str) -> str | None:
    for name in model.slots:
        if pred_curie(name) == pred_curie(curie):
            return name
    return None


def parse_biolink_model(yaml_text: str) -> BiolinkModel:
    """Parse a biolink-model-shaped LinkML YAML (slots: / classes:)."""
    doc = yaml.safe_load(yaml_text) or {}
    return BiolinkModel(
        slots={k: (v or {}) for k, v in (doc.get("slots") or {}).items()},
        classes={k: (v or {}) for k, v in (doc.get("classes") or {}).items()},
        version=str(doc.get("version", "")),
        content_hash=hashlib.md5(yaml_text.encode()).hexdigest()[:12],
    )


def load_biolink_model(yaml_path: str | None = None) -> BiolinkModel:
    """Load from a YAML path (default: the packaged subset fixture that the
    test graph vocabulary is defined against)."""
    with open(yaml_path or _SUBSET_PATH) as fh:
        return parse_biolink_model(fh.read())


# -- Spark adapters ---------------------------------------------------------

def predicate_closure_df(spark, model: BiolinkModel | None = None):
    """The H1/H4 dim: (term, ancestor, is_symmetric, inverse)."""
    model = model or load_biolink_model()
    return spark.createDataFrame(
        model.predicate_closure_rows(),
        "term string, ancestor string, is_symmetric boolean, inverse string",
    )


def category_closure_df(spark, model: BiolinkModel | None = None):
    """The H2 leaf-reduction dim: (term, ancestor)."""
    model = model or load_biolink_model()
    return spark.createDataFrame(
        model.category_closure_rows(), "term string, ancestor string"
    )
