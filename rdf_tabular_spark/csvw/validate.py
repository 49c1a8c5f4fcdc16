"""CSVW metadata validation (M5): inherited-property compatibility.

From-scratch implementation of the reference's inherited-property checks
(reference: metadata.rb:648-716 valid_inherited_property?), producing the
reference's exact error strings (spec/invalid_data/*-errors.txt):

  "{Type} has invalid property '{key}' ('{value}'): expected {reason}"

Checks (child value vs nearest ancestor value along
TableGroup → Table → Schema → Column):
  default/ordered/separator/textDirection — must be identical
  datatype — child base must be an XSD subclass of some ancestor base
  lang     — child must prefix-extend the ancestor tag
  null     — child null list must be a subset of the ancestor's
"""

from __future__ import annotations

from typing import Any, Optional

from .merge import normalize_datatype_obj

INHERITED = ("null", "lang", "textDirection", "separator", "default",
             "ordered", "datatype", "aboutUrl", "propertyUrl", "valueUrl")

# XSD derivation chains (RDF::Literal class hierarchy in the reference):
# child base → immediate supertype
_XSD_PARENT = {
    "integer": "decimal",
    "long": "integer", "int": "long", "short": "int", "byte": "short",
    "nonPositiveInteger": "integer", "negativeInteger": "nonPositiveInteger",
    "nonNegativeInteger": "integer", "positiveInteger": "nonNegativeInteger",
    "unsignedLong": "nonNegativeInteger", "unsignedInt": "unsignedLong",
    "unsignedShort": "unsignedInt", "unsignedByte": "unsignedShort",
    "float": "double",
    "normalizedString": "string", "token": "normalizedString",
    "language": "token", "Name": "token", "NCName": "Name",
    "dateTimeStamp": "dateTime",
    "dayTimeDuration": "duration", "yearMonthDuration": "duration",
    "number": "double", "datetime": "dateTime", "any": "anyAtomicType",
    "binary": "base64Binary",
}
_GENERIC_BASES = {"anyAtomicType", "any"}


def _ancestors(base: str) -> set[str]:
    seen = {base}
    while base in _XSD_PARENT:
        base = _XSD_PARENT[base]
        seen.add(base)
    return seen


def datatype_compatible(child: Any, parent: Any) -> bool:
    """Every child base must be a (non-strict) subclass of some parent base."""
    cdts = child if isinstance(child, list) else [child]
    pdts = parent if isinstance(parent, list) else [parent]
    cbases = [normalize_datatype_obj(c).get("base", "string") for c in cdts]
    pbases = [normalize_datatype_obj(p).get("base", "string") for p in pdts]
    for cb in cbases:
        if not any(pb in _GENERIC_BASES or pb in _ancestors(cb) for pb in pbases):
            return False
    return True


def _fmt(value: Any) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)


def _check(type_name: str, key: str, value: Any, pv: Any, errors: list[str]) -> None:
    reason = None
    if pv is None:
        return
    if key in ("default", "ordered", "separator", "textDirection"):
        if pv != value:
            reason = "same as that defined on parent"
    elif key == "datatype":
        if not datatype_compatible(value, pv):
            reason = "compatible datatype of that defined on parent"
    elif key == "lang":
        if not str(value).startswith(str(pv)):
            reason = f"lang expected to restrict {pv}"
    elif key == "null":
        child = value if isinstance(value, list) else [value]
        parent = pv if isinstance(pv, list) else [pv]
        if not set(child) <= set(parent):
            reason = "subset of that defined on parent"
    if reason:
        errors.append(
            f"{type_name} has invalid property '{key}' ('{_fmt(value)}'): "
            f"expected {reason}")


def _walk(obj: dict, type_name: str, inherited: dict, errors: list[str]) -> None:
    own = {k: obj[k] for k in INHERITED if k in obj}
    for key, value in own.items():
        _check(type_name, key, value, inherited.get(key), errors)
    dt = obj.get("datatype")
    if isinstance(dt, dict) and "base" in dt:
        from .coerce import DATATYPE_IRIS
        if dt["base"] not in DATATYPE_IRIS:
            errors.append(
                f"{type_name} has invalid property 'datatype': "
                f"unknown base '{dt['base']}'")
    scope = {**inherited, **own}
    for t in obj.get("resources", []) or []:
        _walk(t, "Table", scope, errors)
    schema = obj.get("tableSchema")
    if isinstance(schema, dict):
        _walk(schema, "Schema", scope, errors)
    for col in obj.get("columns", []) or []:
        _walk(col, "Column", scope, errors)


def validate_metadata(doc: dict) -> list[str]:
    """→ list of error strings (empty = valid). Driver-side, O(metadata)."""
    errors: list[str] = []
    root_type = doc.get("@type") or ("TableGroup" if "resources" in doc else "Table")
    _walk(doc, root_type, {}, errors)
    return errors
