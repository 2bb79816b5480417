"""Predefined node-tree configs over the driver's TPC-H-ish testdata.

Each entry reproduces one relationship topology from the reference's
e2e golden tests (see FIXTURES.md §2 / reference tests/test_sync_*.py),
mapped onto the tables in TESTDATA.md:

- root-only                    → orders
- one_to_one object FK-on-parent chain → customer → nation → region
- one_to_many object FK-on-child       → orders → lineitem
- one_to_many scalar                   → orders → lineitem(l_linenumber)
- through-table object/scalar          → supplier ↔ part via lineitem
- two children + nesting (flagship)    → orders → customer→nation, lineitem
- transforms (rename/replace/concat)   → on the customer chain
- JSON path columns                    → events.props->k
"""

from __future__ import annotations

import functools

import pyarrow.parquet as pq

from .node import Tree, parse_tree

SCHEMA_SAMPLE_DIR = "/root/testdata/sf0.001"


@functools.lru_cache(maxsize=None)
def _arrow_schema(table: str):
    return pq.read_schema(f"{SCHEMA_SAMPLE_DIR}/{table}.parquet")


def columns_of(table: str) -> list[str]:
    return list(_arrow_schema(table).names)


def column_type_of(table: str, col: str) -> str:
    import pyarrow as pa

    t = _arrow_schema(table).field(col).type
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    return "other"


TREE_CONFIGS: dict[str, dict] = {
    # reference topology 1: root only (tests/test_sync_root.py)
    "root_only": {
        "index": "orders",
        "nodes": {
            "table": "orders",
            "columns": [
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            ],
        },
    },
    # topology 3 + 5 analog: one_to_one object chain, FK on parent
    # (customer.c_nationkey → nation, nation.n_regionkey → region)
    "customer_nation_region": {
        "index": "customer",
        "nodes": {
            "table": "customer",
            "columns": ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"],
            "children": [
                {
                    "table": "nation",
                    "label": "nation",
                    "columns": ["n_nationkey", "n_name"],
                    "relationship": {"type": "one_to_one", "variant": "object"},
                    "children": [
                        {
                            "table": "region",
                            "label": "region",
                            "columns": ["r_regionkey", "r_name"],
                            "relationship": {"type": "one_to_one", "variant": "object"},
                        }
                    ],
                }
            ],
        },
    },
    # topology 4: direct one_to_many object child, FK on child
    "orders_lineitems": {
        "index": "orders",
        "nodes": {
            "table": "orders",
            "columns": ["o_orderkey", "o_orderstatus", "o_totalprice"],
            "children": [
                {
                    "table": "lineitem",
                    "label": "lineitems",
                    "columns": [
                        "l_linenumber",
                        "l_quantity",
                        "l_extendedprice",
                        "l_returnflag",
                        "l_shipdate",
                    ],
                    "relationship": {"type": "one_to_many", "variant": "object"},
                }
            ],
        },
    },
    # one_to_many scalar variant (reference: book → languages codes)
    "orders_linenumbers_scalar": {
        "index": "orders",
        "nodes": {
            "table": "orders",
            "columns": ["o_orderkey", "o_orderstatus"],
            "children": [
                {
                    "table": "lineitem",
                    "label": "linenumbers",
                    "columns": ["l_linenumber"],
                    "relationship": {"type": "one_to_many", "variant": "scalar"},
                }
            ],
        },
    },
    # topology 5/6: through table — supplier's parts via lineitem
    # (supplier ↔ lineitem ↔ part), object variant
    "supplier_parts_through": {
        "index": "supplier",
        "nodes": {
            "table": "supplier",
            "columns": ["s_suppkey", "s_name", "s_acctbal"],
            "children": [
                {
                    "table": "part",
                    "label": "parts",
                    "columns": ["p_partkey", "p_name", "p_brand"],
                    "relationship": {
                        "type": "one_to_many",
                        "variant": "object",
                        "through_tables": ["lineitem"],
                    },
                }
            ],
        },
    },
    # through table, scalar variant (reference: book → subjects names)
    "supplier_part_names_through_scalar": {
        "index": "supplier",
        "nodes": {
            "table": "supplier",
            "columns": ["s_suppkey", "s_name"],
            "children": [
                {
                    "table": "part",
                    "label": "part_names",
                    "columns": ["p_name"],
                    "relationship": {
                        "type": "one_to_many",
                        "variant": "scalar",
                        "through_tables": ["lineitem"],
                    },
                }
            ],
        },
    },
    # flagship: two children, one nested one_to_one chain + one_to_many
    "orders_full": {
        "index": "orders",
        "nodes": {
            "table": "orders",
            "columns": [
                "o_orderkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            ],
            "children": [
                {
                    "table": "customer",
                    "label": "customer",
                    "columns": ["c_custkey", "c_name", "c_mktsegment"],
                    "relationship": {"type": "one_to_one", "variant": "object"},
                    "children": [
                        {
                            "table": "nation",
                            "label": "nation",
                            "columns": ["n_nationkey", "n_name"],
                            "relationship": {"type": "one_to_one", "variant": "object"},
                        }
                    ],
                },
                {
                    "table": "lineitem",
                    "label": "lineitems",
                    "columns": [
                        "l_linenumber",
                        "l_quantity",
                        "l_extendedprice",
                        "l_discount",
                        "l_returnflag",
                        "l_linestatus",
                    ],
                    "relationship": {"type": "one_to_many", "variant": "object"},
                },
            ],
        },
    },
    # one_to_one scalar variant: customer's nation name inlined
    "customer_nation_scalar": {
        "index": "customer",
        "nodes": {
            "table": "customer",
            "columns": ["c_custkey", "c_name"],
            "children": [
                {
                    "table": "nation",
                    "label": "nation_name",
                    "columns": ["n_name"],
                    "relationship": {"type": "one_to_one", "variant": "scalar"},
                }
            ],
        },
    },
    # transforms: replace → rename → concat (ref: pgsync/transform.py:211-216)
    "customer_transforms": {
        "index": "customer",
        "nodes": {
            "table": "customer",
            "columns": ["c_custkey", "c_name", "c_mktsegment"],
            "transform": {
                "replace": {"c_mktsegment": {"AUTOMOBILE": "AUTO"}},
                "rename": {"c_name": "customer_name"},
                "concat": {
                    "columns": ["c_custkey", "customer_name"],
                    "destination": "customer_slug",
                    "delimiter": "-",
                },
            },
        },
    },
    # self-referential tree (reference: examples/node/schema.json) —
    # nation's n_regionkey treated as a parent pointer via explicit FK;
    # exercises same-table alias handling and dual lineage-key merging
    "nation_selfref": {
        "index": "nation",
        "nodes": {
            "table": "nation",
            "columns": ["n_nationkey", "n_name"],
            "children": [
                {
                    "table": "nation",
                    "label": "sub_nations",
                    "columns": ["n_nationkey", "n_name", "n_regionkey"],
                    "relationship": {
                        "type": "one_to_many",
                        "variant": "object",
                        "foreign_key": {
                            "parent": ["n_nationkey"],
                            "child": ["n_regionkey"],
                        },
                    },
                }
            ],
        },
    },
    # multi-pair self-join: the reference's AND→OR onclause rule for
    # child.table == parent.table (ref: pgsync/querybuilder.py:575-577,
    # exercised by examples/node/schema.json). A nation is "related" if
    # it points at the parent (sub-nation: child.n_regionkey =
    # parent.n_nationkey) OR shares its region (child.n_regionkey =
    # parent.n_regionkey) — compiles to union-of-equi-joins, not a
    # nested-loop OR join
    "nation_related": {
        "index": "nation",
        "nodes": {
            "table": "nation",
            "columns": ["n_nationkey", "n_name"],
            "children": [
                {
                    "table": "nation",
                    "label": "related",
                    "columns": ["n_nationkey", "n_name"],
                    "relationship": {
                        "type": "one_to_many",
                        "variant": "object",
                        "foreign_key": {
                            "parent": ["n_nationkey", "n_regionkey"],
                            "child": ["n_regionkey", "n_regionkey"],
                        },
                    },
                }
            ],
        },
    },
    # two children on the SAME table under one parent — exercises
    # per-node aliasing and dual lineage-key merging for sibling nodes
    # (the reference supports repeated tables via node labels)
    "orders_dual_lineitems": {
        "index": "orders",
        "nodes": {
            "table": "orders",
            "columns": ["o_orderkey", "o_orderstatus"],
            "children": [
                {
                    "table": "lineitem",
                    "label": "item_quantities",
                    "columns": ["l_quantity"],
                    "relationship": {"type": "one_to_many", "variant": "scalar"},
                },
                {
                    "table": "lineitem",
                    "label": "item_flags",
                    "columns": ["l_linenumber", "l_returnflag", "l_linestatus"],
                    "relationship": {"type": "one_to_many", "variant": "object"},
                },
            ],
        },
    },
    # THREE-level nesting with one_to_many inside one_to_many: each
    # customer doc carries its orders array, each order carrying its
    # own lineitems array — the reference's canonical deep-tree shape
    # (ref: examples/airbnb/schema.json user→booking→... chains,
    # pgsync/querybuilder.py recursive _children walk)
    "customer_orders_lineitems": {
        "index": "customer",
        "nodes": {
            "table": "customer",
            "columns": ["c_custkey", "c_name", "c_mktsegment"],
            "children": [
                {
                    "table": "orders",
                    "label": "orders",
                    "columns": ["o_orderkey", "o_orderstatus", "o_totalprice"],
                    "relationship": {"type": "one_to_many", "variant": "object"},
                    "children": [
                        {
                            "table": "lineitem",
                            "label": "lineitems",
                            "columns": ["l_linenumber", "l_quantity", "l_returnflag"],
                            "relationship": {
                                "type": "one_to_many",
                                "variant": "object",
                            },
                        }
                    ],
                }
            ],
        },
    },
    # JSON path projection on a JSON string column
    # (ref: pgsync/node.py:197-303 '->' operators)
    "events_json_path": {
        "index": "events",
        "nodes": {
            "table": "events",
            "columns": ["event_id", "event_type", "props->k"],
        },
    },
    # '->>' / '#>' text-extraction variants of the JSON path operators
    "events_json_text_path": {
        "index": "events",
        "nodes": {
            "table": "events",
            "columns": ["event_id", "props->>k"],
            "label": "events_text",
        },
    },
    # composite-PK root: _id = pks joined with '|'
    # (ref: pgsync/sync.py:527-535; composite iteration
    #  querybuilder.py:506-510)
    "lineitem_composite_root": {
        "index": "lineitem",
        "nodes": {
            "table": "lineitem",
            "columns": ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"],
        },
    },
}


@functools.lru_cache(maxsize=None)
def tree(name: str) -> Tree:
    return parse_tree(TREE_CONFIGS[name])


def tree_names() -> list[str]:
    return list(TREE_CONFIGS)
