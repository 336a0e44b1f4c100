"""Error types.

Mirrors the reference error model (flechasdb ``src/error.rs:5-18``): a single
closed set of failure categories used across the whole library. We map each
Rust enum variant onto a Python exception class under a common base so callers
can catch either the whole family or a specific category.
"""

from __future__ import annotations


class FlechasError(Exception):
    """Base class for all flechasdb-tpu errors (``error.rs:5``)."""


class InvalidArgs(FlechasError, ValueError):
    """Caller passed invalid arguments (``error.rs:7``)."""


class InvalidData(FlechasError, ValueError):
    """Stored/loaded data is inconsistent or malformed (``error.rs:9``)."""


class InvalidContext(FlechasError, RuntimeError):
    """An operation was attempted in an invalid state (``error.rs:11``)."""


class VerificationFailure(FlechasError):
    """Content hash of a file does not match its name (``error.rs:13``)."""


class IOError_(FlechasError, OSError):
    """Underlying I/O failed (``error.rs:15``)."""


class ProtobufError(FlechasError, ValueError):
    """Protocol Buffers (de)serialization failed (``error.rs:17``)."""
