"""zentity_spark — a PySpark-native entity-resolution (record-linkage) engine.

A from-scratch batch re-expression of the resolution semantics of the
zentity Elasticsearch plugin (reference: /root/reference, zentity-io/zentity
v1.8.3): attribute-model-driven blocking, vectorized pairwise matcher
scoring, and transitive clustering via large-star/small-star connected
components — over tables of multi-turn transcripts
(conv_id, turn_idx, role, text, tool, ts).

The reference resolves ONE entity per REST request by iteratively querying
Elasticsearch (Job.java:1075-1172 `traverse`); this engine resolves ALL
entities at once with DataFrame blocking + pairwise predicates + a
connected-components fixed point, and additionally provides a seeded
`resolve()` mode that replicates the reference's hop traversal exactly
(for fixture parity, `_hop`, caps, scope, terms/ids seeding).
"""

from zentity_spark.errors import ValidationException, ZentityError
from zentity_spark.model import Model
from zentity_spark.pipeline import ResolutionConfig, resolve_all
# the seeded traversal entry point stays at zentity_spark.resolve.resolve:
# re-exporting the FUNCTION here would shadow the `resolve` SUBMODULE
# attribute on the package (monkeypatching/attribute access breaks)
from zentity_spark.resolve import Input, SeededConfig
from zentity_spark.scoring import (
    attribute_identity_confidence_score,
    composite_identity_confidence_score,
)

__version__ = "0.1.0"


def plugin_info() -> dict:
    """The Home-action body (`GET _zentity`, HomeAction.java:50-67):
    name/description/website plus a version object naming the engine
    release and the execution-engine release — the reference reports its
    Elasticsearch version in that second slot; here the execution engine
    is Spark."""
    import pyspark

    return {
        "name": "zentity_spark",
        "description": (
            "Entity resolution (record linkage) for multi-turn transcript"
            " tables: model-driven blocking, pairwise matcher scoring, and"
            " transitive clustering on Apache Spark."
        ),
        "website": "https://zentity.io",
        "version": {
            "zentity_spark": __version__,
            "spark": pyspark.__version__,
        },
    }


__all__ = [
    "Input",
    "Model",
    "ResolutionConfig",
    "SeededConfig",
    "ValidationException",
    "ZentityError",
    "attribute_identity_confidence_score",
    "composite_identity_confidence_score",
    "plugin_info",
    "resolve_all",
]
