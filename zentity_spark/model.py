"""Entity model: parse + validate.

Port of io.zentity.model.* semantics (reference files cited per rule):
 - Model.java:42-49   — exactly four required top-level maps, sorted (TreeMap)
 - Model.java:97-124  — strict ES-style names
 - Model.java:142-155 — attribute nesting rule (no name-prefix overrides)
 - Attribute.java     — type ∈ {boolean,date,number,string}, score ∈ [0,1]
 - Resolver.java      — non-empty attribute list, integral weight
 - Matcher.java:80-89 — {{ field }}/{{ value }}/{{ params.* }} variables
 - Index.java / IndexField.java — fields map; attribute required;
   quality ∈ [0,1]; field without matcher is unusable (Job.java:296-303)

Pure Python: runs on the driver; the compiled model is broadcast-sized.
All maps are kept sorted for deterministic output (reference
CONTRIBUTING.md: "Outputs must be deterministic. Use TreeMap and TreeSet").
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any

from zentity_spark.errors import ValidationException

VALID_TYPES = ("boolean", "date", "number", "string")

# Matcher.java variable pattern (Patterns.java:32): \{\{\s*([^\s{}]+)\s*}}
VARIABLE_RE = re.compile(r"\{\{\s*([^\s{}]+)\s*\}\}")

# ES Strings.INVALID_FILENAME_CHARS (referenced by Model.java:104-105)
_INVALID_NAME_CHARS = set('\\/*?"<>| ,')
_MAX_STRICT_NAME_BYTES = 255


def validate_strict_name(name: Any) -> None:
    """Model.java:97-124 validateStrictName — ES index-name rules."""
    if name is None or not isinstance(name, str) or name == "":
        raise ValidationException(f"Invalid name [{name or ''}], must not be empty.")
    bad = _INVALID_NAME_CHARS & set(name)
    if bad:
        raise ValidationException(
            f"Invalid name [{name}], must not contain the following characters: "
            + ", ".join(sorted(_INVALID_NAME_CHARS))
        )
    if "#" in name:
        raise ValidationException(f"Invalid name [{name}], must not contain '#'.")
    if ":" in name:
        raise ValidationException(f"Invalid name [{name}], must not contain ':'.")
    if name[0] in "_-+":
        raise ValidationException(f"Invalid name [{name}], must not start with '_', '-', or '+'.")
    byte_count = len(name.encode("utf-8"))
    if byte_count > _MAX_STRICT_NAME_BYTES:
        raise ValidationException(
            f"Invalid name [{name}], name is too long, ({byte_count} > {_MAX_STRICT_NAME_BYTES})."
        )
    if name in (".", ".."):
        raise ValidationException(f"Invalid name [{name}], must not be '.' or '..'.")
    if name.lower() != name:
        raise ValidationException(f"Invalid name [{name}], must be lowercase.")


def _require_object(value: Any, what: str) -> dict:
    if not isinstance(value, dict):
        raise ValidationException(f"'{what}' must be an object.")
    return value


@dataclass
class Attribute:
    """model/Attribute.java:33-230."""

    name: str
    type: str = "string"  # default string (Attribute.java:43)
    score: float | None = None  # identity-confidence base score (Attribute.java:126-132)
    params: dict = field(default_factory=dict)

    @classmethod
    def parse(cls, name: str, spec: Any) -> "Attribute":
        validate_strict_name(name)
        spec = _require_object(spec if spec is not None else {}, f"attributes.{name}")
        atype = spec.get("type", "string")
        if atype is None:
            atype = "string"
        if not isinstance(atype, str) or atype not in VALID_TYPES:
            raise ValidationException(
                f"'attributes.{name}.type' has an unrecognized type [{atype}]."
            )
        score = spec.get("score", None)
        if score is not None:
            if isinstance(score, bool) or not isinstance(score, (int, float)):
                raise ValidationException(f"'attributes.{name}.score' must be a number.")
            score = float(score)
            if not (0.0 <= score <= 1.0):
                raise ValidationException(
                    f"'attributes.{name}.score' must be in the range of 0.0 - 1.0."
                )
        params = spec.get("params", {}) or {}
        params = _require_object(params, f"attributes.{name}.params")
        for key in spec:
            if key not in ("type", "score", "params"):
                raise ValidationException(f"'attributes.{name}.{key}' is not a recognized field.")
        return cls(name=name, type=atype, score=score, params=dict(params))


@dataclass
class Resolver:
    """model/Resolver.java:31-176: a set of attributes that JOINTLY assert
    identity (logical AND), plus an integral weight (default 0)."""

    name: str
    attributes: list[str]
    weight: int = 0

    @classmethod
    def parse(cls, name: str, spec: Any) -> "Resolver":
        validate_strict_name(name)
        spec = _require_object(spec, f"resolvers.{name}")
        attrs = spec.get("attributes")
        if not isinstance(attrs, list) or not attrs:
            raise ValidationException(f"'resolvers.{name}.attributes' must be a non-empty array.")
        for a in attrs:
            if not isinstance(a, str) or a == "":
                raise ValidationException(
                    f"'resolvers.{name}.attributes' must be an array of non-empty strings."
                )
        weight = spec.get("weight", 0)
        if weight is None:
            weight = 0
        # Resolver.java:109-115: must be integral
        if isinstance(weight, bool) or not isinstance(weight, (int, float)):
            raise ValidationException(f"'resolvers.{name}.weight' must be an integer.")
        if isinstance(weight, float):
            if not weight.is_integer():
                raise ValidationException(f"'resolvers.{name}.weight' must be an integer.")
            weight = int(weight)
        for key in spec:
            if key not in ("attributes", "weight"):
                raise ValidationException(f"'resolvers.{name}.{key}' is not a recognized field.")
        return cls(name=name, attributes=sorted(set(attrs)), weight=int(weight))


@dataclass
class Matcher:
    """model/Matcher.java:34-217: a named clause template with
    {{ field }}/{{ value }}/{{ params.* }} variables, default params, and
    quality ∈ [0,1]. The clause is arbitrary ES query DSL in the
    reference; here it is INTERPRETED by zentity_spark.matchers into a
    vectorized comparator (see matchers.classify_clause)."""

    name: str
    clause: dict
    params: dict = field(default_factory=dict)
    quality: float | None = None
    variables: list[str] = field(default_factory=list)

    @classmethod
    def parse(cls, name: str, spec: Any) -> "Matcher":
        validate_strict_name(name)
        spec = _require_object(spec, f"matchers.{name}")
        clause = spec.get("clause")
        if not isinstance(clause, dict) or not clause:
            raise ValidationException(f"'matchers.{name}.clause' must be a non-empty object.")
        params = spec.get("params", {}) or {}
        params = _require_object(params, f"matchers.{name}.params")
        quality = spec.get("quality", None)
        if quality is not None:
            if isinstance(quality, bool) or not isinstance(quality, (int, float)):
                raise ValidationException(f"'matchers.{name}.quality' must be a number.")
            quality = float(quality)
            if not (0.0 <= quality <= 1.0):
                raise ValidationException(
                    f"'matchers.{name}.quality' must be in the range of 0.0 - 1.0."
                )
        for key in spec:
            if key not in ("clause", "params", "quality"):
                raise ValidationException(f"'matchers.{name}.{key}' is not a recognized field.")
        variables = sorted(set(VARIABLE_RE.findall(json.dumps(clause))))
        return cls(
            name=name,
            clause=clause,
            params=dict(params),
            quality=quality,
            variables=variables,
        )


@dataclass
class IndexField:
    """model/IndexField.java:31-201: physical field → logical attribute,
    optional matcher + quality. A field with no matcher is unusable for
    querying (Job.java:296-303 indexFieldHasMatcher)."""

    name: str
    attribute: str
    matcher: str | None = None
    quality: float | None = None

    @classmethod
    def parse(cls, index_name: str, name: str, spec: Any) -> "IndexField":
        if not isinstance(name, str) or name == "":
            raise ValidationException(f"'indices.{index_name}.fields' has an empty field name.")
        spec = _require_object(spec, f"indices.{index_name}.fields.{name}")
        if "attribute" not in spec:
            # IndexField.java:173 — required-field walk message
            raise ValidationException(
                f"'indices.{index_name}.fields.{name}' is missing required"
                " field 'attribute'."
            )
        attribute = spec.get("attribute")
        if not isinstance(attribute, str) or attribute == "":
            # IndexField.java:131
            raise ValidationException(
                f"'indices.{index_name}.fields.{name}.attribute' must not be empty."
            )
        matcher = spec.get("matcher", None)
        if matcher is not None and (not isinstance(matcher, str) or matcher == ""):
            raise ValidationException(
                f"'indices.{index_name}.fields.{name}.matcher' must be a non-empty string or null."
            )
        quality = spec.get("quality", None)
        if quality is not None:
            if isinstance(quality, bool) or not isinstance(quality, (int, float)):
                raise ValidationException(
                    f"'indices.{index_name}.fields.{name}.quality' must be a number."
                )
            quality = float(quality)
            if not (0.0 <= quality <= 1.0):
                raise ValidationException(
                    f"'indices.{index_name}.fields.{name}.quality' must be in the range of 0.0 - 1.0."
                )
        for key in spec:
            if key not in ("attribute", "matcher", "quality"):
                raise ValidationException(
                    f"'indices.{index_name}.fields.{name}.{key}' is not a recognized field."
                )
        return cls(name=name, attribute=attribute, matcher=matcher, quality=quality)


@dataclass
class Index:
    """model/Index.java:32-188: a named physical source with a fields map
    and a reverse map attribute → fields (Index.java:134-143)."""

    name: str
    fields: dict[str, IndexField]
    attribute_fields: dict[str, list[str]] = field(default_factory=dict)

    @classmethod
    def parse(cls, name: str, spec: Any) -> "Index":
        if not isinstance(name, str) or name == "":
            raise ValidationException("'indices' has an empty index name.")
        spec = _require_object(spec, f"indices.{name}")
        if "fields" not in spec:
            # Index.java:166 — required-field walk message
            raise ValidationException(
                f"'indices.{name}' is missing required field 'fields'."
            )
        fields_spec = spec.get("fields")
        if not isinstance(fields_spec, dict) or not fields_spec:
            # Index.java:113
            raise ValidationException(
                f"'indices.{name}.fields' must not be empty in the entity model."
            )
        fields = {
            fname: IndexField.parse(name, fname, fspec)
            for fname, fspec in sorted(fields_spec.items())
        }
        for key in spec:
            if key != "fields":
                raise ValidationException(f"'indices.{name}.{key}' is not a recognized field.")
        attribute_fields: dict[str, list[str]] = {}
        for fname, f in fields.items():
            attribute_fields.setdefault(f.attribute, []).append(fname)
        for a in attribute_fields:
            attribute_fields[a].sort()
        return cls(name=name, fields=fields, attribute_fields=attribute_fields)


class Model:
    """The entity model: attributes, resolvers, matchers, indices
    (Model.java:42-44; all four required, Model.java:200-203)."""

    REQUIRED_FIELDS = ("attributes", "resolvers", "matchers", "indices")

    def __init__(self, spec: dict | str, validate_runnable: bool = True):
        if isinstance(spec, str):
            spec = json.loads(spec)
        spec = _require_object(spec, "entity model")
        for f_ in self.REQUIRED_FIELDS:
            if f_ not in spec:
                raise ValidationException(f"'{f_}' is missing from the entity model.")
            _require_object(spec[f_], f_)
            if not spec[f_]:
                raise ValidationException(f"'{f_}' must not be empty in the entity model.")
        for key in spec:
            if key not in self.REQUIRED_FIELDS:
                raise ValidationException(f"'{key}' is not a recognized field.")

        # the validated source document, as the models API returns it
        # (ModelsAction GET serves the stored _source verbatim)
        self.spec: dict = spec
        self.attributes: dict[str, Attribute] = {
            n: Attribute.parse(n, s) for n, s in sorted(spec["attributes"].items())
        }
        self.resolvers: dict[str, Resolver] = {
            n: Resolver.parse(n, s) for n, s in sorted(spec["resolvers"].items())
        }
        self.matchers: dict[str, Matcher] = {
            n: Matcher.parse(n, s) for n, s in sorted(spec["matchers"].items())
        }
        self.indices: dict[str, Index] = {
            n: Index.parse(n, s) for n, s in sorted(spec["indices"].items())
        }
        self._validate_attribute_nesting()
        if validate_runnable:
            self._validate_runnable()

    def _validate_attribute_nesting(self) -> None:
        """Model.java:142-155: a dotted attribute name must not be a
        prefix ('override') of another attribute name."""
        names = list(self.attributes.keys())
        for a in names:
            for b in names:
                if a != b and (a + ".").startswith(b + "."):
                    raise ValidationException(
                        f"'attributes.{b}' is invalid because 'attributes.{a}' overrides its name."
                    )

    def _validate_runnable(self) -> None:
        """Cross-references: resolver attributes and index-field attributes
        must exist; index-field matchers must exist (Model.java parse*
        cross-checks and Input.java validation)."""
        for r in self.resolvers.values():
            for a in r.attributes:
                if a not in self.attributes:
                    raise ValidationException(
                        f"'resolvers.{r.name}.attributes' references an undefined attribute [{a}]."
                    )
        for idx in self.indices.values():
            for f in idx.fields.values():
                if f.attribute not in self.attributes:
                    raise ValidationException(
                        f"'indices.{idx.name}.fields.{f.name}.attribute' references an "
                        f"undefined attribute [{f.attribute}]."
                    )
                if f.matcher is not None and f.matcher not in self.matchers:
                    raise ValidationException(
                        f"'indices.{idx.name}.fields.{f.name}.matcher' references an "
                        f"undefined matcher [{f.matcher}]."
                    )

    # ------------------------------------------------------------------
    # Helpers used by the compiler / job

    def usable_fields(self, index_name: str, attribute: str) -> list[IndexField]:
        """Fields of `index_name` mapped to `attribute` that have a
        matcher (fields without one are unusable, Job.java:296-303)."""
        idx = self.indices[index_name]
        return [
            idx.fields[f]
            for f in idx.attribute_fields.get(attribute, [])
            if idx.fields[f].matcher is not None
        ]

    def can_query_resolver(self, index_name: str, resolver_name: str,
                           attrs_with_values: set[str]) -> bool:
        """Job.java:315-346 canQueryResolver: every attribute of the
        resolver has input values AND a usable (matcher-bearing) field."""
        r = self.resolvers[resolver_name]
        for a in r.attributes:
            if a not in attrs_with_values:
                return False
            if not self.usable_fields(index_name, a):
                return False
        return True

    def resolver_weight_groups(self, resolver_names: list[str]) -> dict[int, list[str]]:
        """Query.java:387-396 groupResolversByWeight (sorted keys)."""
        groups: dict[int, list[str]] = {}
        for r in sorted(resolver_names):
            groups.setdefault(self.resolvers[r].weight, []).append(r)
        return dict(sorted(groups.items()))

    def prune(self, scope: dict | None) -> "Model":
        """Apply scope include/exclude over indices / resolvers /
        attributes by pruning the model in place, as Input.java:70-144
        does (applied at Input.java:352-378). Returns self."""
        if not scope:
            return self
        for section in ("include", "exclude"):
            block = scope.get(section) or {}
            for kind in ("indices", "resolvers", "attributes"):
                names = block.get(kind)
                if names is None:
                    continue
                if kind == "attributes" and isinstance(names, dict):
                    # value-level attribute scope ({attr: [values]},
                    # ScopeField.java:53-75) — applied as doc filters by
                    # the resolution job, not by model pruning
                    continue
                if isinstance(names, str):
                    names = [names]
                if not isinstance(names, list):
                    raise ValidationException(f"'scope.{section}.{kind}' must be an array.")
                target = getattr(self, kind)
                unknown = [n for n in names if n not in target]
                if section == "include" and unknown:
                    raise ValidationException(
                        f"'scope.include.{kind}' references undefined names {unknown}."
                    )
                if section == "include":
                    for n in list(target):
                        if n not in names:
                            del target[n]
                else:
                    for n in names:
                        target.pop(n, None)
        # Drop resolvers whose attributes were excluded, then indices'
        # fields pointing at dropped attributes (Input.java pruning).
        self.resolvers = {
            n: r for n, r in self.resolvers.items()
            if all(a in self.attributes for a in r.attributes)
        }
        for idx in self.indices.values():
            idx.fields = {
                fn: f for fn, f in idx.fields.items() if f.attribute in self.attributes
            }
            idx.attribute_fields = {
                a: fs for a, fs in idx.attribute_fields.items() if a in self.attributes
            }
        return self


def load_model(path: str) -> Model:
    """Model store GET-equivalent (ModelsAction.java:281-310): read a
    model JSON document from a file path (driver-side)."""
    with open(path) as fh:
        return Model(json.load(fh))
