"""DBpedia ontology sources: offline NT → class-tree prep (SURVEY A4) and
class-name normalization (A19), plus the loader that feeds the real
788-class tree into the KG path.

Reference semantics being reimplemented (not copied):
  * class name = ``underscore(bestLabel())`` then dashes/underscores →
    spaces, parens removed (``Duke/class_tree.py:105-115``,
    ``Duke/utils.py:8-9``);
  * tree JSON = ``{name: {"parents": [...], "children": [...]}}`` built
    from rdfs:subClassOf, optionally pruned of isolated classes
    (``Duke/class_tree.py:126-158``);
  * the shipped artifact is ``class-tree_dbpedia_2016-10.json`` (788
    classes), loaded by ``EmbeddedClassTree`` (``Duke/class_tree.py:14``).

The reference leans on ontospy + inflection; neither is needed here — the
NT subset we consume (subClassOf + label triples) is a line format, and
the name normalization is a three-step string rule.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional

from duke_spark.kernel.tree import Tree

# the vendored reference artifact — read at runtime, never copied
REFERENCE_TREE_PATH = (
    "/root/reference/Duke/ontologies/class-tree_dbpedia_2016-10.json")

RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"

_CAMEL_BOUNDARY_1 = re.compile(r"([A-Z]+)([A-Z][a-z])")
_CAMEL_BOUNDARY_2 = re.compile(r"([a-z\d])([A-Z])")
_NT_TRIPLE = re.compile(
    r"^<([^>]+)>\s+<([^>]+)>\s+(.+?)\s*\.\s*$")
_NT_LITERAL = re.compile(r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z-]+))?')


def to_class_name(label: str) -> str:
    """A19 normalize (``Duke/class_tree.py:105-115``): snake-case the
    label (CamelCase → underscore-separated, lowercase), then underscores
    and dashes become spaces and parentheses vanish."""
    name = _CAMEL_BOUNDARY_1.sub(r"\1_\2", str(label))
    name = _CAMEL_BOUNDARY_2.sub(r"\1_\2", name)
    name = name.replace("-", "_").lower()
    name = name.replace("_", " ").replace("(", "").replace(")", "")
    return name


def _local_name(iri: str) -> str:
    return iri.rstrip("/#").rsplit("/", 1)[-1].rsplit("#", 1)[-1]


def parse_nt_ontology(path: str, lang: str = "en"
                      ) -> Dict[str, Dict[str, set]]:
    """Minimal N-Triples read of an OWL ontology: per-class label (prefer
    ``lang``, fall back to any, then the IRI local name) and subClassOf
    edges. Returns {iri: {"label", "parents": {iri}, "children": {iri}}}.
    """
    labels: Dict[str, str] = {}
    label_lang: Dict[str, Optional[str]] = {}
    parents: Dict[str, set] = {}
    children: Dict[str, set] = {}
    subjects: set = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            m = _NT_TRIPLE.match(line)
            if not m:
                continue
            subj, pred, obj = m.groups()
            if pred == RDFS_SUBCLASS and obj.startswith("<"):
                parent = obj[1:-1]
                parents.setdefault(subj, set()).add(parent)
                children.setdefault(parent, set()).add(subj)
                subjects.update((subj, parent))
            elif pred == RDFS_LABEL:
                lm = _NT_LITERAL.match(obj)
                if not lm:
                    continue
                text, ltag = lm.group(1), lm.group(2)
                text = text.encode().decode("unicode_escape")
                # prefer the requested language; first match wins within it
                if subj not in labels or (
                        label_lang.get(subj) != lang and ltag == lang):
                    labels[subj] = text
                    label_lang[subj] = ltag
                subjects.add(subj)
    return {
        iri: {
            "label": labels.get(iri, _local_name(iri)),
            "parents": parents.get(iri, set()),
            "children": children.get(iri, set()),
        }
        for iri in subjects
    }


def build_class_tree(classes: Dict[str, Dict[str, set]],
                     prune: bool = False) -> Tree:
    """A4 (``Duke/class_tree.py:126-158``): normalized-name relationship
    map; ``prune`` drops classes with neither parents nor children.
    Output lists are sorted for determinism (the reference inherits
    ontospy's ordering; ours must be reproducible byte for byte)."""
    name_of = {iri: to_class_name(meta["label"])
               for iri, meta in classes.items()}
    tree: Tree = {}
    for iri, meta in classes.items():
        tree[name_of[iri]] = {
            "parents": sorted({name_of[p] for p in meta["parents"]
                               if p in name_of}),
            "children": sorted({name_of[c] for c in meta["children"]
                                if c in name_of}),
        }
    if prune:
        tree = {n: rels for n, rels in tree.items()
                if rels["parents"] or rels["children"]}
    return tree


def write_class_tree(tree: Tree, out_path: str) -> None:
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(tree, f, indent=4, sort_keys=True)


def load_dbpedia_tree(path: Optional[str] = None) -> Tree:
    """Load the real DBpedia class tree (A2 JSON scan through
    ``kernel.tree.load_tree``). Default resolution order: explicit arg →
    ``DUKE_SPARK_ONTOLOGY`` env var → the reference artifact if present."""
    from duke_spark.kernel.tree import load_tree
    path = path or os.environ.get("DUKE_SPARK_ONTOLOGY") or \
        REFERENCE_TREE_PATH
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"ontology tree not found at {path}; generate one with "
            "scripts/prepare_ontology.py or set DUKE_SPARK_ONTOLOGY")
    return load_tree(path)


def ontology_vocab_words(tree: Tree) -> list:
    """Sorted distinct words across class names — the minimum vocabulary
    an embedding must cover to keep every class after OOV normalization."""
    return sorted({w for name in tree for w in name.split(" ") if w})
