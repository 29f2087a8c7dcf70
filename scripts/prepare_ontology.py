"""Offline ontology prep (SURVEY A4 + A19): DBpedia ``.nt`` → class-tree
JSON consumed by the KG canonicalization path.

    python scripts/prepare_ontology.py ontology.nt -o class-tree.json
    python scripts/prepare_ontology.py ontology.nt -o pruned.json --prune

Reference analogue: ``Duke/class_tree.py:126-158``
(``generate_class_tree_file``), which shells out to ontospy; here the NT
subset (rdfs:label / rdfs:subClassOf) is parsed directly.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duke_spark.sources.ontology import (build_class_tree,  # noqa: E402
                                         parse_nt_ontology, write_class_tree)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ontology", help="N-Triples ontology file (.nt)")
    ap.add_argument("-o", "--out", required=True, help="output tree JSON")
    ap.add_argument("--prune", action="store_true",
                    help="drop classes with no parents and no children")
    ap.add_argument("--lang", default="en", help="preferred label language")
    args = ap.parse_args()

    classes = parse_nt_ontology(args.ontology, lang=args.lang)
    tree = build_class_tree(classes, prune=args.prune)
    write_class_tree(tree, args.out)
    print(f"wrote {len(tree)} classes to {args.out}")


if __name__ == "__main__":
    main()
