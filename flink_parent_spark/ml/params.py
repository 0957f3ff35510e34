"""Parameter surface of the ML pipeline API.

Reference: flink-ml-parent/flink-ml-api —
`org/apache/flink/ml/api/misc/param/ParamInfo.java` (typed parameter
descriptor: name, aliases, description, optionality, default),
`Params.java` (a typed map with json (de)serialization that every
PipelineStage carries), `WithParams.java` (the fluent get/set mixin).
"""

from __future__ import annotations

import json
from typing import Any, Callable, Generic, TypeVar

T = TypeVar("T")


class ParamInfo(Generic[T]):
    """Typed parameter descriptor (ParamInfo.java): name + description,
    optional/required, default value, optional validator."""

    def __init__(
        self,
        name: str,
        description: str = "",
        *,
        optional: bool = True,
        has_default: bool = False,
        default: T | None = None,
        validator: Callable[[T], bool] | None = None,
    ):
        self.name = name
        self.description = description
        self.optional = optional
        self.has_default = has_default
        self.default = default
        self.validator = validator


class Params:
    """Typed parameter map with json round-trip (Params.java). Values must
    be json-serializable — the same restriction the reference's jackson
    serialization imposes in practice."""

    def __init__(self) -> None:
        self._m: dict[str, Any] = {}

    def set(self, info: "ParamInfo | str", value: Any) -> "Params":
        name = info.name if isinstance(info, ParamInfo) else info
        if isinstance(info, ParamInfo) and info.validator is not None:
            if not info.validator(value):
                raise ValueError(
                    f"value {value!r} fails validation for param {name!r}"
                )
        self._m[name] = value
        return self

    def get(self, info: "ParamInfo | str") -> Any:
        name = info.name if isinstance(info, ParamInfo) else info
        if name in self._m:
            return self._m[name]
        if isinstance(info, ParamInfo):
            if info.has_default:
                return info.default
            if info.optional:
                return None
        raise KeyError(f"param {name!r} not set and has no default")

    def contains(self, info: "ParamInfo | str") -> bool:
        name = info.name if isinstance(info, ParamInfo) else info
        return name in self._m

    def remove(self, info: "ParamInfo | str") -> "Params":
        self._m.pop(info.name if isinstance(info, ParamInfo) else info, None)
        return self

    def size(self) -> int:
        return len(self._m)

    def to_json(self) -> str:
        return json.dumps(self._m, sort_keys=True)

    def load_json(self, s: str) -> "Params":
        self._m = dict(json.loads(s) or {})
        return self

    @classmethod
    def from_json(cls, s: str) -> "Params":
        return cls().load_json(s)

    def merge(self, other: "Params | None") -> "Params":
        if other is not None:
            self._m.update(other._m)
        return self

    def clone(self) -> "Params":
        p = Params()
        p._m = dict(self._m)
        return p


class WithParams:
    """Fluent parameter mixin (WithParams.java): every stage holds a Params
    and exposes get/set through itself."""

    def __init__(self) -> None:
        self._params = Params()

    def get_params(self) -> Params:
        return self._params

    def set(self, info: "ParamInfo | str", value: Any):
        self._params.set(info, value)
        return self

    def get(self, info: "ParamInfo | str") -> Any:
        return self._params.get(info)
