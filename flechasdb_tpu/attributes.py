"""Vector attributes.

The reference attaches free-form key/value attributes to vectors
(``src/db.rs:14-45``): values are either strings or unsigned 64-bit ints, an
``Attributes`` map holds one vector's attributes, and an ``AttributeTable``
maps vector UUIDs to their attributes. Python dicts and a small value wrapper
cover the same contract; we validate types eagerly so that serialization can
never fail late.
"""

from __future__ import annotations

import uuid as _uuid
from typing import Dict, Union

from .errors import InvalidArgs

# A value is either a string or an unsigned 64-bit integer
# (``db.rs:14-27`` AttributeValue::{String, Uint64}).
AttributeValue = Union[str, int]

#: One vector's attributes (``db.rs:41`` `Attributes`).
Attributes = Dict[str, AttributeValue]

#: All attributes in a database, keyed by vector UUID (``db.rs:44``).
AttributeTable = Dict[_uuid.UUID, Attributes]

_U64_MAX = (1 << 64) - 1


def check_attribute_value(value: AttributeValue) -> AttributeValue:
    """Validates an attribute value; returns it unchanged.

    Raises :class:`InvalidArgs` for unsupported types, negative ints, or ints
    that do not fit in an unsigned 64-bit field (the wire type is ``uint64``,
    ``database.proto:88-93``).
    """
    if isinstance(value, str):
        return value
    if isinstance(value, bool):
        # bool is an int subclass in Python; reject to avoid silent coercion.
        raise InvalidArgs("attribute value must be str or non-negative int")
    if isinstance(value, int):
        if value < 0 or value > _U64_MAX:
            raise InvalidArgs(
                f"integer attribute must fit in uint64, got {value}"
            )
        return value
    raise InvalidArgs(
        f"attribute value must be str or int, got {type(value).__name__}"
    )
