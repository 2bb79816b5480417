"""Error taxonomy mirroring the reference's validation surface.

Reference parity: pgsync/exc.py (toluaina/pgsync @ /root/reference) defines
per-failure exception classes raised during schema/node validation. We keep
the same names so config errors are recognizable to reference users.
"""


class PgsyncSparkError(Exception):
    """Base class for all engine errors."""


class SchemaError(PgsyncSparkError):
    """Raised when the top-level JSON schema document is malformed.

    Reference: pgsync/exc.py SchemaError.
    """


class NodeAttributeError(PgsyncSparkError):
    """Unknown attribute on a node definition.

    Reference: pgsync/exc.py NodeAttributeError; whitelist at
    pgsync/constants.py:34-52.
    """


class RelationshipError(PgsyncSparkError):
    """Malformed relationship block."""


class RelationshipTypeError(PgsyncSparkError):
    """relationship.type not in {one_to_one, one_to_many}.

    Reference: pgsync/constants.py:16-24.
    """


class RelationshipVariantError(PgsyncSparkError):
    """relationship.variant not in {scalar, object}.

    Reference: pgsync/constants.py:26-32.
    """


class RelationshipAttributeError(PgsyncSparkError):
    """Unknown attribute inside a relationship block."""


class RelationshipForeignKeyError(PgsyncSparkError):
    """foreign_key block must declare both parent and child columns."""


class MultipleThroughTablesError(PgsyncSparkError):
    """More than one through table declared (reference supports max 1).

    Reference: pgsync/node.py relationship parsing.
    """


class TableNotInNodeError(PgsyncSparkError):
    """A payload/event references a table absent from the node tree."""


class ForeignKeyError(PgsyncSparkError):
    """No foreign-key path could be resolved between parent and child."""


class PrimaryKeyNotFoundError(PgsyncSparkError):
    """Table has no primary key registered in the catalog."""


class TableNotFoundError(PgsyncSparkError):
    """Table missing from the catalog / dataset directory."""


class ColumnNotFoundError(PgsyncSparkError):
    """Declared column not present on the table."""


class InvalidTGOPError(PgsyncSparkError):
    """CDC payload op not in {INSERT, UPDATE, DELETE, TRUNCATE}.

    Reference: pgsync/constants.py:61-72.
    """
