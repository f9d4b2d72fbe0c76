"""Back-compat shim — the registry lives in ``registry.py`` at package
root so operator modules can import ``register`` without triggering the
``queries`` package __init__ (which imports every query module and
assumes registration order)."""

from algorithmproject_spark_spark.registry import (  # noqa: F401
    QueryFn,
    QuerySpec,
    REGISTRY,
    register,
)
