"""Error taxonomy.

The reference distinguishes errors raised *by zentity* (validation of
models/inputs, HTTP 400) from errors raised *by elasticsearch* (execution,
HTTP 500) — see ZentityPlugin.java sendResponseError and the two error
fixtures TestEntityModelZentityError.json / TestEntityModelElasticsearchError.json.
We mirror that split: ValidationException for model/input problems,
ZentityError for engine/execution problems.
"""


class ZentityError(Exception):
    """Engine-side failure (reference: errors reported with by=zentity)."""

    by = "zentity"
    status = 500  # REST status the reference maps this class to


class ValidationException(ZentityError):
    """Invalid entity model or resolution input.

    Reference: io.zentity.common.ValidationException — raised throughout
    io.zentity.model.* and io.zentity.resolution.input.* parsing;
    mapped to 400 by ZentityPlugin.sendResponseError.
    """

    status = 400


class NotFoundException(ZentityError):
    """Unknown entity type (ZentityPlugin.java:52-56; mapped to 404 by
    sendResponseError; raised at ResolutionAction.java:102)."""

    status = 404


class ResourceAlreadyExistsException(ZentityError):
    """Store already set up — the reference surfaces Elasticsearch's
    resource_already_exists_exception with 400 when `_setup` runs
    against an existing .zentity-models index (SetupActionIT
    testSetupDeconflict)."""

    status = 400
