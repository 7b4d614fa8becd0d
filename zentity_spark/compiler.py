"""Model compiler: entity model → executable blocking/matching plan.

This is the analog of the reference's query-compilation layer
(Query.java:320-396 resolver sorting/trie + Query.java:432-765 clause
assembly), re-targeted at DataFrames: instead of compiling the model
into one Elasticsearch boolean query per hop, we compile it once into

- a FIELD MAPPING table (index, physical path, field, attribute,
  matcher, comparator kind, quality) — broadcast-sized;
- per-resolver attribute lists + weight groups (Query.java:387-396);
- per-(attribute, matcher) comparator specs (matchers.classify_clause);
- the attribute score table (scoring.score_table).

Everything here is driver-side pure Python over a broadcast-sized model,
exactly like the reference compiles queries on one node while ES
executes them on many.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from zentity_spark.matchers import ComparatorSpec, classify_clause, merge_params
from zentity_spark.model import Model
from zentity_spark.scoring import score_table


@dataclass
class FieldSpec:
    """One usable (matcher-bearing) index field, compiled."""

    index: str
    field: str            # model field name, e.g. field_a.clean
    attribute: str
    matcher: str
    spec: ComparatorSpec
    quality: float | None
    # candidate physical paths, longest first: the reference extracts by
    # trying the full dotted path then stripping trailing multi-field
    # parts (Job.java:825-853) — e.g. field_a.clean → field_a
    path_candidates: list[str] = field(default_factory=list)


def _path_candidates(field_name: str) -> list[str]:
    parts = field_name.split(".")
    return [".".join(parts[: len(parts) - i]) for i in range(len(parts))]


class CompiledModel:
    def __init__(self, model: Model, input_attr_params: dict[str, dict] | None = None):
        self.model = model
        input_attr_params = input_attr_params or {}

        self.field_specs: list[FieldSpec] = []
        for index_name, idx in sorted(model.indices.items()):
            for fname, f_ in sorted(idx.fields.items()):
                if f_.matcher is None:
                    continue  # unusable (Job.java:296-303)
                matcher = model.matchers[f_.matcher]
                attr = model.attributes[f_.attribute]
                params = merge_params(
                    matcher.params, attr.params, input_attr_params.get(f_.attribute, {})
                )
                spec = classify_clause(matcher.name, matcher.clause, params)
                self.field_specs.append(
                    FieldSpec(
                        index=index_name,
                        field=fname,
                        attribute=f_.attribute,
                        matcher=matcher.name,
                        spec=spec,
                        quality=f_.quality,
                        path_candidates=_path_candidates(fname),
                    )
                )

        # resolver → sorted attribute list; weight groups ascending
        self.resolver_attrs: dict[str, list[str]] = {
            n: list(r.attributes) for n, r in sorted(model.resolvers.items())
        }
        self.resolver_weights: dict[str, int] = {
            n: r.weight for n, r in sorted(model.resolvers.items())
        }
        self.weights_all_equal = len(set(self.resolver_weights.values())) <= 1
        self.scores = score_table(model)
        self.attr_types = {n: a.type for n, a in model.attributes.items()}

    # ------------------------------------------------------------------

    def specs_for(self, index: str, attribute: str) -> list[FieldSpec]:
        return [
            fs for fs in self.field_specs if fs.index == index and fs.attribute == attribute
        ]

    def indexes(self) -> list[str]:
        return sorted(self.model.indices.keys())

    def attributes_used(self) -> list[str]:
        """Attributes referenced by at least one resolver (sorted)."""
        used = set()
        for attrs in self.resolver_attrs.values():
            used.update(attrs)
        return sorted(used)

    def kinds_for_attribute(self, attribute: str) -> set[str]:
        return {fs.spec.kind for fs in self.field_specs if fs.attribute == attribute}

    def date_window_for(self, attribute: str) -> float | None:
        """Largest date window over this attribute's date_window fields
        (blocking must be as coarse as the widest window)."""
        windows = [
            float(fs.spec.threshold)
            for fs in self.field_specs
            if fs.attribute == attribute and fs.spec.kind == "date_window"
        ]
        return max(windows) if windows else None

    def mapping_rows(self, physical_paths: dict[tuple[str, str], str]) -> list[dict]:
        """Rows for the broadcast field-mapping table.

        physical_paths: (index, model field name) → resolved physical
        path present in the data (see transcripts.resolve_physical_paths).
        Fields whose paths resolve to nothing are skipped (the value
        simply never occurs — same as the reference's 'unused' fields).
        """
        rows = []
        for fs in self.field_specs:
            path = physical_paths.get((fs.index, fs.field))
            if path is None:
                continue
            fmt = fs.spec.params.get("format")
            if fmt not in (None, "", "null", "epoch_millis", "epoch_second"):
                # driver-side whitelist: only formats our SimpleDateFormat
                # subset tokenizes are forwarded to the Spark-side
                # try_to_timestamp (an unparseable pattern would throw at
                # runtime inside the scan; unsupported ones fall back to
                # the trial chain instead)
                from zentity_spark.java_dates import _tokenize

                try:
                    _tokenize(str(fmt))
                except ValueError:
                    fmt = None
            rows.append(
                {
                    "source": fs.index,
                    "path": path,
                    "field": fs.field,
                    "attribute": fs.attribute,
                    "matcher": fs.matcher,
                    "kind": fs.spec.kind,
                    "threshold": None if fs.spec.threshold is None else str(fs.spec.threshold),
                    "quality": fs.quality,
                    "attr_type": self.attr_types[fs.attribute],
                    # declared Java date format (input > model-attr >
                    # matcher, already merged in spec.params) — the
                    # Spark-side ts parse tries it before the trial chain
                    "date_fmt": str(fmt) if fmt not in (None, "", "null") else None,
                }
            )
        return rows


def compile_model(model: Model, input_attr_params: dict[str, dict] | None = None) -> CompiledModel:
    return CompiledModel(model, input_attr_params)
