"""Validation errors mirroring the reference's errors.py catalog."""

from __future__ import annotations


class FeastError(Exception):
    pass


class EntityDFMissingColumnsError(FeastError):
    """entity_df lacks required join-key / timestamp columns
    (reference: FeastEntityDFMissingColumnsError, bigquery.py:159-197)."""

    def __init__(self, expected: list[str], missing: list[str]):
        super().__init__(
            f"entity_df is missing columns {sorted(missing)}; expected {sorted(expected)}"
        )


class FeatureNameCollisionError(FeastError):
    """Duplicate output feature names in one retrieval
    (reference: feature_store.py:636-657)."""

    def __init__(self, collisions: list[str]):
        super().__init__(
            "duplicate feature names in retrieval "
            f"{sorted(collisions)}; use full_feature_names=True to disambiguate"
        )


class FeatureViewNotFoundError(FeastError):
    def __init__(self, name: str):
        super().__init__(f"feature view {name!r} not found in registry")


class EntityNotFoundError(FeastError):
    def __init__(self, name: str):
        super().__init__(f"entity {name!r} not found in registry")


class TimestampColumnInferenceError(FeastError):
    """Zero or several timestamp columns — cannot infer
    (reference: inference.py:62-119, file.py:68-80)."""

    def __init__(self, candidates: list[str]):
        if not candidates:
            msg = "no timestamp column found to infer event_timestamp from"
        else:
            msg = (
                "ambiguous event_timestamp inference; candidates: "
                f"{sorted(candidates)}"
            )
        super().__init__(msg)
