"""Node/Tree validation parity (reference model: tests/test_node.py in
/root/reference — same error surface, our config format)."""

import pytest

from pgsync_spark import exc, parse_tree
from pgsync_spark.node import parse_column


def test_parse_plain_column():
    c = parse_column("o_orderkey")
    assert c.name == "o_orderkey" and c.label == "o_orderkey" and not c.is_json_path


def test_parse_json_arrow_path():
    # ref: pgsync/node.py:197-303 auto-label joins tokens with "_"
    c = parse_column("doc->x->1->z")
    assert c.name == "doc"
    assert c.path == ("x", "1", "z")
    assert c.label == "doc_x_1_z"


def test_parse_json_hash_path():
    c = parse_column("doc#>{a,b,c}")
    assert c.path == ("a", "b", "c")
    assert c.label == "doc_a_b_c"


def test_parse_json_text_operator():
    assert parse_column("props->>k").as_text
    assert not parse_column("props->k").as_text


def test_unknown_node_attribute():
    with pytest.raises(exc.NodeAttributeError):
        parse_tree({"table": "orders", "nonsense": 1})


def test_bad_relationship_type():
    with pytest.raises(exc.RelationshipTypeError):
        parse_tree(
            {
                "table": "orders",
                "children": [
                    {"table": "lineitem", "relationship": {"type": "many_to_many"}}
                ],
            }
        )


def test_bad_relationship_variant():
    with pytest.raises(exc.RelationshipVariantError):
        parse_tree(
            {
                "table": "orders",
                "children": [
                    {
                        "table": "lineitem",
                        "relationship": {"type": "one_to_many", "variant": "bag"},
                    }
                ],
            }
        )


def test_multiple_through_tables_rejected():
    # ref: max one through table (pgsync/node.py:79-124)
    with pytest.raises(exc.MultipleThroughTablesError):
        parse_tree(
            {
                "table": "supplier",
                "children": [
                    {
                        "table": "part",
                        "relationship": {
                            "type": "one_to_many",
                            "through_tables": ["a", "b"],
                        },
                    }
                ],
            }
        )


def test_child_requires_relationship_type():
    with pytest.raises(exc.RelationshipTypeError):
        parse_tree({"table": "orders", "children": [{"table": "lineitem"}]})


def test_missing_table():
    with pytest.raises(exc.SchemaError):
        parse_tree({"columns": ["a"]})


def test_foreign_key_arity_mismatch():
    with pytest.raises(exc.RelationshipForeignKeyError):
        parse_tree(
            {
                "table": "orders",
                "children": [
                    {
                        "table": "lineitem",
                        "relationship": {
                            "type": "one_to_many",
                            "foreign_key": {"parent": ["a", "b"], "child": ["c"]},
                        },
                    }
                ],
            }
        )


def test_tree_tables_includes_through():
    t = parse_tree(
        {
            "table": "supplier",
            "children": [
                {
                    "table": "part",
                    "relationship": {
                        "type": "one_to_many",
                        "through_tables": ["lineitem"],
                    },
                }
            ],
        }
    )
    assert t.tables() == {"supplier", "part", "lineitem"}
