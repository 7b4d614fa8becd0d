"""Entity-model store: the Models API re-expressed over a directory.

The reference stores entity models as documents in a hidden
`.zentity-models` index with strict validation before every write
(ModelsAction.java:352-530; SetupAction.java:43-91 creates the index).
Here the store is a directory of `<entity_type>.json` files — the
driver-side equivalent (model documents are broadcast-sized config, not
data). Semantics preserved:

- create fails if the model exists (POST / `_create` op,
  ModelsAction.java:352-411)
- update overwrites, delete removes (PUT/DELETE, :413-530)
- every write validates the model AND the entity type name first
- get-all enumerates the store (GET, :215-272)
- bulk model ops run strictly IN SERIES (ModelsAction.java:73-74
  "must run in series") with per-item error envelopes
  (ModelsAction.java:759-883)
"""

from __future__ import annotations

import json
import os

from zentity_spark.errors import NotFoundException, ValidationException
from zentity_spark.model import Model, validate_strict_name


class ModelStore:
    def __init__(self, root: str):
        self.root = root

    def setup(self, exist_ok: bool = True) -> dict:
        """SetupAction equivalent: create the store location and return
        the reference's `{"acknowledged": true}` body (SetupAction.java).
        With exist_ok=False, re-setup against an existing store raises
        the reference's conflict (resource_already_exists_exception,
        400 — SetupActionIT testSetupDeconflict)."""
        if not exist_ok and os.path.isdir(self.root):
            from zentity_spark.errors import ResourceAlreadyExistsException

            raise ResourceAlreadyExistsException(
                f"index [{self.root}] already exists"
            )
        os.makedirs(self.root, exist_ok=True)
        return {"acknowledged": True}

    def _path(self, entity_type: str) -> str:
        validate_strict_name(entity_type)
        return os.path.join(self.root, f"{entity_type}.json")

    def exists(self, entity_type: str) -> bool:
        return os.path.exists(self._path(entity_type))

    def get(self, entity_type: str) -> Model:
        path = self._path(entity_type)
        if not os.path.exists(path):
            raise NotFoundException(f"Entity type '{entity_type}' not found.")
        with open(path) as fh:
            return Model(json.load(fh))

    def get_all(self) -> dict[str, Model]:
        if not os.path.isdir(self.root):
            return {}
        out = {}
        for fn in sorted(os.listdir(self.root)):
            if fn.endswith(".json"):
                with open(os.path.join(self.root, fn)) as fh:
                    out[fn[:-5]] = Model(json.load(fh))
        return out

    def create(self, entity_type: str, spec: dict) -> None:
        """Fails if present (the reference's `_create` op)."""
        Model(spec)  # validate before write
        path = self._path(entity_type)
        if os.path.exists(path):
            raise ValidationException(
                f"Entity type [{entity_type}] already exists."
            )
        self.setup()
        self._write(path, spec)

    def update(self, entity_type: str, spec: dict) -> None:
        """Create-or-overwrite (PUT semantics)."""
        Model(spec)
        self.setup()
        self._write(self._path(entity_type), spec)

    def delete(self, entity_type: str) -> None:
        path = self._path(entity_type)
        if not os.path.exists(path):
            raise NotFoundException(f"Entity type '{entity_type}' not found.")
        os.remove(path)

    @staticmethod
    def _write(path: str, spec: dict) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(spec, fh, sort_keys=True, indent=2)
        os.replace(tmp, path)

    def bulk_ndjson(self, body: str, default_params: dict | None = None) -> list[dict]:
        """The reference's models-bulk NDJSON format
        (ModelsAction.java:759-883 runBulk):

            { "create": { "entity_type": "person" }}
            { ...entity model... }
            { "update": { "entity_type": "person" }}
            { ...entity model... }
            { "delete": { "entity_type": "person" }}
            {}

        One action key per action line (create/update/delete), params
        object merged over request-level defaults. Operations run
        strictly in series; failures produce per-item
        {action: {"error": {...}}} envelopes and the batch continues
        (delegateFailure, ModelsAction.java:742-749)."""
        from zentity_spark.envelope import serialize_exception

        lines = [ln for ln in body.splitlines() if ln.strip()]
        if len(lines) % 2 != 0:
            raise ValidationException(
                "Bulk requests must have repeating pairs of action and payload lines."
            )
        items = []
        for action_line, model_line in zip(lines[0::2], lines[1::2]):
            action = "action"
            try:
                obj = json.loads(action_line)
                if not isinstance(obj, dict):
                    raise ValidationException(
                        "Each bulk operation must have only one action and payload."
                    )
                params: dict = {}
                for name, value in obj.items():
                    if name in ("create", "update", "delete"):
                        if action != "action":
                            raise ValidationException(
                                "Each bulk operation must have only one action and payload."
                            )
                        action = name
                        params = dict(value or {})
                    else:
                        raise ValidationException(
                            f"'{name}' is not a recognized action for bulk model management."
                        )
                if action == "action":
                    raise ValidationException(
                        "Each bulk operation must have only one action and payload."
                    )
                merged = {**(default_params or {}), **params}
                entity_type = merged.get("entity_type")
                if not entity_type:
                    # per-action message parity (ModelsAction.java:356,417,477)
                    verb = {"create": "indexing", "update": "updating",
                            "delete": "deleting"}[action]
                    raise ValidationException(
                        f"Entity type must be specified when {verb} an entity model."
                    )
                spec = json.loads(model_line)
                if action == "create":
                    self.create(entity_type, spec)
                elif action == "update":
                    self.update(entity_type, spec)
                else:
                    self.delete(entity_type)
                items.append({action: {"entity_type": entity_type, "result": "ok"}})
            except Exception as e:  # per-item error envelope, batch continues
                items.append(
                    {action: {"error": json.loads("{" + serialize_exception(e, False) + "}")}}
                )
        return items

    def bulk(self, actions: list[tuple[str, str, dict | None]]) -> list[dict]:
        """Bulk model ops, strictly serial; per-item error envelopes.

        actions: [(op, entity_type, spec-or-None)], op ∈ create/update/delete.
        """
        items = []
        for op, entity_type, spec in actions:
            try:
                if op == "create":
                    self.create(entity_type, spec)
                elif op == "update":
                    self.update(entity_type, spec)
                elif op == "delete":
                    self.delete(entity_type)
                else:
                    raise ValidationException(f"Unrecognized bulk action [{op}].")
                items.append({op: {"entity_type": entity_type, "ok": True}})
            except Exception as e:  # per-item error, batch continues
                items.append(
                    {op: {"entity_type": entity_type, "ok": False,
                          "error": {"by": getattr(e, "by", "zentity"),
                                    "type": type(e).__name__, "reason": str(e)}}}
                )
        return items
