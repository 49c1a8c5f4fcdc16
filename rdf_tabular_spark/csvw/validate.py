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


_ISO_DATEISH = r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}:\d{2}(\.\d+)?)?([+-]\d{2}:\d{2}|Z)?$"
_ISO_TIMEISH = r"^\d{2}:\d{2}:\d{2}(\.\d+)?([+-]\d{2}:\d{2}|Z)?$"


def _value_reason(key: str, value: Any) -> Optional[str]:
    """Value-validity tier (reference: metadata.rb:661-682 — checked even
    with no inherited value). Returns the reference's 'expected …' reason."""
    import re
    if key in ("aboutUrl", "propertyUrl", "valueUrl", "default"):
        if not isinstance(value, str):
            return "string"
    elif key == "ordered":
        if str(value).lower() not in ("true", "false", "1", "0"):
            return "boolean"
    elif key == "separator":
        if not (isinstance(value, str) and len(value) == 1):
            return "single character"
    elif key == "textDirection":
        if value not in ("rtl", "ltr"):
            return "rtl or ltr"
    elif key == "null":
        vals = value if isinstance(value, list) else [value]
        if isinstance(value, dict) or not all(isinstance(v, str) for v in vals):
            return "string or array of strings"
    elif key == "lang":
        if not re.match(r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$", str(value)):
            return "valid BCP47 language tag"
    elif key == "datatype":
        # reference metadata.rb:666-669: every base must be a built-in
        # datatype name OR an absolute URI (custom datatype IRIs pass)
        from .coerce import DATATYPE_IRIS
        dts = value if isinstance(value, list) else [value]
        for d in dts:
            base = normalize_datatype_obj(d).get("base", "string")
            is_abs_uri = isinstance(base, str) and re.match(
                r"^[A-Za-z][A-Za-z0-9+.-]*://", base)
            if base not in DATATYPE_IRIS and not is_abs_uri:
                return "valid datatype"
    return None


def _facet_errors(type_name: str, dt: dict, errors: list[str]) -> None:
    """Structural facet-value checks (reference: metadata.rb:546-559)."""
    import re
    for key in ("length", "minLength", "maxLength"):
        v = dt.get(key)
        if v is not None and not (isinstance(v, int)
                                  and not isinstance(v, bool) and v > 0):
            errors.append(
                f"{type_name} has invalid property '{key}': {v!r}, "
                f"expected a positive integer")
    def _posint(v):
        return isinstance(v, int) and not isinstance(v, bool) and v > 0

    length = dt.get("length")
    if _posint(length):
        # length combined with min/maxLength must be consistent
        # (reference: metadata.rb:550-552 — its Ruby condition is inverted
        # and fires exactly when the values ARE equal; the W3C metadata
        # spec §5.11.2 rule implemented here: length >= minLength and
        # length <= maxLength)
        if _posint(dt.get("minLength")) and length < dt["minLength"]:
            errors.append(
                f"{type_name} has invalid property 'minLength': "
                f"Use of both length and minLength requires "
                f"length >= minLength")
        if _posint(dt.get("maxLength")) and length > dt["maxLength"]:
            errors.append(
                f"{type_name} has invalid property 'maxLength': "
                f"Use of both length and maxLength requires "
                f"length <= maxLength")
    if any(dt.get(k) is not None for k in ("length", "minLength",
                                           "maxLength")):
        # length facets apply only to strings (and subtypes) or binary
        # values — the rule the reference leaves as a comment at
        # metadata.rb:551 (W3C metadata spec §5.11.2)
        base = dt.get("base", "string")
        anc = _ancestors(base)
        if not (anc & {"string", "base64Binary", "hexBinary"}
                or base in ("xml", "html", "json")):
            errors.append(
                f"{type_name} has invalid property 'length': "
                f"length facets apply only to string or binary "
                f"datatypes, not '{base}'")
    did = dt.get("@id")
    if isinstance(did, str):
        from .coerce import DATATYPE_IRIS
        if did in set(DATATYPE_IRIS.values()):
            # W3C metadata §5.11.2: a derived datatype's @id MUST NOT be
            # the URL of a built-in datatype
            errors.append(
                f"{type_name} has invalid property '@id': {did}, "
                f"datatype @id must not be a built-in datatype URL")
    for key in ("minimum", "maximum", "minInclusive", "maxInclusive",
                "minExclusive", "maxExclusive"):
        v = dt.get(key)
        if v is None:
            continue
        ok = (isinstance(v, (int, float)) and not isinstance(v, bool)) or \
            (isinstance(v, str)
             and (re.match(_ISO_DATEISH, v) or re.match(_ISO_TIMEISH, v)
                  # CSVW allows numeric facets as strings ("minimum": "5")
                  or re.match(r"^-?\d+(\.\d+)?$", v)))
        if not ok:
            errors.append(
                f"{type_name} has invalid property '{key}': {v}, "
                f"expected numeric or valid date/time")


def _check(type_name: str, key: str, value: Any, pv: Any, errors: list[str]) -> None:
    reason = _value_reason(key, value)
    if reason:
        errors.append(
            f"{type_name} has invalid property '{key}' ('{_fmt(value)}'): "
            f"expected {reason}")
        return
    if pv is None:
        return
    reason = None
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


def _validate_dialect(dia: dict, errors: list[str]) -> None:
    """Dialect description checks (reference: metadata.rb:493-546,616-621):
    boolean properties accept true/false/1/0, char properties are
    single-character strings, counts are positive integers, trim is the
    5-value enum, and `encoding` must resolve in the codec registry
    (Ruby: Encoding.find). Explicit JSON nulls are skipped (a null resets
    a char property, e.g. quoteChar — the engine accepts that; the
    reference's validate! predates it)."""
    import codecs
    for key in ("doubleQuote", "header", "skipInitialSpace", "skipBlankRows"):
        if key in dia and str(dia[key]).lower() not in ("true", "false",
                                                        "1", "0"):
            errors.append(
                f"Dialect has invalid property '{key}': {dia[key]!r}, "
                f"expected true, false, 1, or 0")
    for key in ("commentPrefix", "delimiter", "quoteChar"):
        v = dia.get(key)
        if key in dia and v is not None and not (isinstance(v, str)
                                                 and len(v) == 1):
            errors.append(
                f"Dialect has invalid property '{key}': {v!r}, "
                f"expected a single character string")
    for key in ("headerColumnCount", "headerRowCount",
                "skipColumns", "skipRows"):
        v = dia.get(key)
        if key in dia and not (isinstance(v, int)
                               and not isinstance(v, bool) and v > 0):
            errors.append(
                f"Dialect has invalid property '{key}': {v!r} "
                f"must be a positive integer")
    if "lineTerminator" in dia and not isinstance(dia["lineTerminator"], str):
        errors.append(
            f"Dialect has invalid property 'lineTerminator': "
            f"{dia['lineTerminator']!r}, expected a string")
    if "trim" in dia and str(dia["trim"]).lower() not in (
            "true", "false", "1", "0", "start", "end"):
        errors.append(
            f"Dialect has invalid property 'trim': {dia['trim']!r}, "
            f"expected true, false, 1, 0, start or end")
    enc = dia.get("encoding")
    if enc is not None:
        try:
            codecs.lookup(str(enc))
        except (LookupError, TypeError):
            errors.append(
                f"Dialect has invalid property 'encoding': {enc!r}, "
                f"expected a valid encoding")


_TRANSFORMATION_PROPS = {"@type", "source", "targetFormat", "scriptFormat",
                         "title", "titles", "url"}
_TRANSFORMATION_REQUIRED = ("targetFormat", "scriptFormat")

# Per-class property tables (reference PROPERTIES constants,
# metadata.rb:1218-1226 TableGroup, :1290-1301 Table, :1406-1415 Schema,
# :1516-1524 Column, :1374-1381 Transformation) — the walked classes also
# accept every INHERITED property (metadata.rb:460-462). Both the
# reference's draft-era spellings ('resources', 'title') and the
# W3C-final ones ('tables', 'titles') are accepted, matching
# merge.KEY_ALIASES.
_CLASS_PROPS = {
    "TableGroup": {"@type", "resources", "tables", "tableSchema",
                   "tableDirection", "dialect", "transformations"},
    "Table": {"@type", "dialect", "notes", "suppressOutput",
              "tableDirection", "tableSchema", "transformations", "url"},
    "Schema": {"@type", "columns", "foreignKeys", "primaryKey",
               "rowTitles"},
    "Column": {"@type", "name", "suppressOutput", "title", "titles",
               "required", "virtual"},
}
_CLASS_REQUIRED = {"Table": ("url",)}

_DIALECT_PROPS = {"@type", "commentPrefix", "delimiter", "doubleQuote",
                  "encoding", "header", "headerColumnCount",
                  "headerRowCount", "lineTerminator", "quoteChar",
                  "skipBlankRows", "skipColumns", "skipInitialSpace",
                  "skipRows", "trim"}


_BCP47_RE = __import__("re").compile(
    r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$")


def _common_property_errors(obj: dict, errors: list[str]) -> None:
    """JSON-LD dialect checks on common-property VALUES (reference:
    metadata.rb:1139-1163 normalize_jsonld raises): explicit blank-node
    @id, @type+@language on one value object, and @-keys other than
    @value/@type/@language/@id/@list/@set inside node objects."""
    def walk(v):
        if isinstance(v, list):
            for x in v:
                walk(x)
        elif isinstance(v, dict):
            if "@value" in v:
                if "@type" in v and "@language" in v:
                    errors.append(
                        "Value object may not contain both @type and "
                        "@language")
                lv = v.get("@language")
                if lv is not None and not _BCP47_RE.match(str(lv)):
                    errors.append(
                        "Value object with @language must use valid "
                        f"language: {lv}")
                return
            vid = v.get("@id")
            if isinstance(vid, str) and vid.startswith("_:"):
                errors.append("Invalid use of explicit BNode on @id")
            for k, x in v.items():
                if str(k).startswith("@") and k not in (
                        "@id", "@type", "@language", "@value",
                        "@list", "@set"):
                    errors.append(f"Invalid use of {k} in JSON-LD content")
                elif not str(k).startswith("@"):
                    walk(x)
    for k, v in obj.items():
        if ":" in str(k) and not str(k).startswith("@"):
            walk(v)
        elif k == "notes":
            walk(v)


def _class_key_errors(obj: dict, type_name: str, errors: list[str]) -> None:
    """The generic key checks at the top of the reference's validate!
    (metadata.rb:463-470): only expected properties, required properties
    present, declared @type matches the class. Prefixed (common-property)
    keys are exempt everywhere EXCEPT Dialect (metadata.rb:466's
    ``unless is_a?(Dialect)``); the missing-keys message lists the
    PRESENT required keys, mirroring the reference's Ruby quirk."""
    if type_name == "Dialect":
        keys = [k for k in obj if k not in ("@id", "@context")]
        expected = _DIALECT_PROPS
    else:
        keys = [k for k in obj if k not in ("@id", "@context")
                and ":" not in str(k)]
        expected = _CLASS_PROPS[type_name] | set(INHERITED)
    unexpected = [k for k in keys if k not in expected]
    if unexpected:
        listing = "[" + ", ".join(f'"{k}"' for k in unexpected) + "]"
        errors.append(f"{type_name} has unexpected keys: {listing}")
    required = _CLASS_REQUIRED.get(type_name, ())
    present = [k for k in required if k in keys]
    if present != list(required):
        listing = "[" + ", ".join(f'"{k}"' for k in present) + "]"
        errors.append(f"{type_name} missing required keys: {listing}")
    declared = obj.get("@type")
    if declared is not None and declared != type_name:
        errors.append(
            f"{type_name} has invalid property '@type': \"{declared}\", "
            f"expected {type_name}")
    td = obj.get("tableDirection")
    if td is not None and td not in ("rtl", "ltr", "default"):
        errors.append(
            f"{type_name} has invalid property 'tableDirection': "
            f"\"{td}\", expected rtl, ltr, or default")


def _validate_transformation(tr: dict, errors: list[str]) -> None:
    """Transformation description checks (reference: metadata.rb:1343-1371
    PROPERTIES/REQUIRED + the generic validate! at metadata.rb:456-470):
    only the class's properties are allowed, and targetFormat/scriptFormat
    are required. Error strings mirror the reference's, including its
    Ruby-array formatting and its quirk of printing the PRESENT required
    keys in the missing-keys message."""
    keys = [k for k in tr if k not in ("@id", "@context")
            and ":" not in str(k)]
    unexpected = [k for k in keys if k not in _TRANSFORMATION_PROPS]
    if unexpected:
        listing = "[" + ", ".join(f'"{k}"' for k in unexpected) + "]"
        errors.append(f"Transformation has unexpected keys: {listing}")
    present = [k for k in _TRANSFORMATION_REQUIRED if k in keys]
    if present != list(_TRANSFORMATION_REQUIRED):
        listing = "[" + ", ".join(f'"{k}"' for k in present) + "]"
        errors.append(f"Transformation missing required keys: {listing}")
    # W3C csvw-metadata §5.10.2: url is ALSO required (the reference's
    # REQUIRED at metadata.rb:1353 omits it — divergence kept W3C-correct,
    # same policy as the FK/length-facet fixes), and the three link
    # properties must be strings
    if "url" not in keys:
        errors.append("Transformation missing required keys: [\"url\"]")
    for lk in ("url", "targetFormat", "scriptFormat"):
        v = tr.get(lk)
        if lk in tr and not isinstance(v, str):
            errors.append(
                f"Transformation has invalid property '{lk}': {v!r}, "
                f"expected a link (string)")
    src = tr.get("source")
    if src is not None and src not in ("json", "rdf"):
        # reference: metadata.rb:587-590
        errors.append(
            f"Transformation has invalid property 'source': \"{src}\", "
            f"expected json or rdf")


def _column_name(c: dict, index: int) -> str:
    """Resolved column name: ``name`` ▷ first title ▷ ``_col.N``
    (reference Column#name, metadata.rb:1452-1456)."""
    if c.get("name"):
        return c["name"]
    t = c.get("titles")
    if isinstance(t, dict):
        vals = list(t.values())
        t = vals[0] if vals else None
    if isinstance(t, list):
        t = next((x for x in t if isinstance(x, str)), None)
    if isinstance(t, str):
        return t
    return f"_col.{index + 1}"


def _walk(obj: dict, type_name: str, inherited: dict, errors: list[str]) -> None:
    _class_key_errors(obj, type_name, errors)
    if type_name != "Dialect":
        _common_property_errors(obj, errors)
    own = {k: obj[k] for k in INHERITED if k in obj}
    for key, value in own.items():
        _check(type_name, key, value, inherited.get(key), errors)
    # boolean class properties (not inherited, so outside the _check loop):
    # virtual/required on columns, suppressOutput on tables and columns
    for key in ("virtual", "suppressOutput", "required"):
        if key in obj and str(obj[key]).lower() not in ("true", "false",
                                                        "1", "0"):
            errors.append(
                f"{type_name} has invalid property '{key}': {obj[key]!r}, "
                f"expected boolean")
    dt = obj.get("datatype")
    if isinstance(dt, dict):
        _facet_errors(type_name, dt, errors)
    cols_list = obj.get("columns")
    if isinstance(cols_list, list):
        # reference validate! columns branch (metadata.rb:478-489):
        # resolved column names must be unique
        seen_names = []
        for i, c in enumerate(cols_list):
            if not isinstance(c, dict):
                continue
            seen_names.append(_column_name(c, i))
        if len(set(seen_names)) != len(seen_names):
            listing = "[" + ", ".join(f'"{n}"' for n in seen_names) + "]"
            errors.append(
                f"{type_name} has invalid property 'columns': "
                f"must have unique names: {listing}")
    for ref_key in ("primaryKey", "rowTitles"):
        if ref_key not in obj:
            continue
        # column-reference resolution (reference: metadata.rb:567-570);
        # a column without `name` is named from its first title, whatever
        # shape `titles` takes (string | array | language map — CSVW §5.6)
        names = {_column_name(c, i)
                 for i, c in enumerate(obj.get("columns") or [])
                 if isinstance(c, dict)}
        refs = obj[ref_key] if isinstance(obj[ref_key], list) \
            else [obj[ref_key]]
        for ref in refs:
            if ref not in names:
                errors.append(
                    f"{type_name} has invalid property '{ref_key}': "
                    f"column reference not found {ref}")
    fks = obj.get("foreignKeys")
    if isinstance(fks, list):
        # structural FK checks (reference: metadata.rb:517-541): exactly
        # {columns, reference}; the reference object names its parent by
        # exactly one of resource | schemaReference (the reference's
        # draft-era 'tableSchema' spelling also accepted)
        names = {_column_name(c, i)
                 for i, c in enumerate(obj.get("columns") or [])
                 if isinstance(c, dict)}
        for fk in fks:
            if not isinstance(fk, dict):
                errors.append(
                    f"{type_name} has invalid property 'foreignKeys': "
                    f"reference must be an object: {fk!r}")
                continue
            fk_cols = fk.get("columns", fk.get("columnReference"))
            if not (fk_cols and fk.get("reference")):
                errors.append(
                    f"{type_name} has invalid property 'foreignKeys': "
                    f"missing columns and reference")
            extra = set(fk.keys()) - {"columns", "columnReference",
                                      "reference"}
            if extra:
                errors.append(
                    f"{type_name} has invalid property 'foreignKeys': "
                    f"has extra entries {sorted(fk.keys())}")
            for k in (fk_cols if isinstance(fk_cols, list)
                      else [fk_cols]):
                if k is not None and k not in names:
                    errors.append(
                        f"{type_name} has invalid property 'foreignKeys': "
                        f"column reference not found {k}")
            ref = fk.get("reference")
            if isinstance(ref, dict):
                # schema-target spellings: W3C-final 'schemaReference',
                # the reference's draft-era 'schema'
                # (spec/data/junior-roles.json) and 'tableSchema'
                # (metadata.rb:536-540). The reference accepts a
                # target-less reference silently; we flag it.
                targets = [k for k in ("resource", "schemaReference",
                                       "schema", "tableSchema") if k in ref]
                if "resource" in targets and len(targets) > 1:
                    errors.append(
                        f"{type_name} has invalid property 'foreignKeys': "
                        f"reference has a schemaReference: {ref!r}")
                elif not targets:
                    errors.append(
                        f"{type_name} has invalid property 'foreignKeys': "
                        f"reference missing resource or schemaReference")
    for tr in obj.get("transformations", []) or []:
        if isinstance(tr, dict):
            _validate_transformation(tr, errors)
    dia = obj.get("dialect")
    if isinstance(dia, dict):
        _class_key_errors(dia, "Dialect", errors)
        _validate_dialect(dia, errors)
    if type_name == "Column" and ("titles" in obj or "title" in obj):
        # natural-language property (reference: metadata.rb:648-654 via
        # the :title branch at :619 — validate! sees the normalized
        # langmap form; this checks the equivalent raw forms:
        # string | array of strings | langmap of string/array-of-string)
        v = obj.get("titles", obj.get("title"))

        def _nl_ok(x):
            return isinstance(x, str) or (
                isinstance(x, list) and all(isinstance(y, str) for y in x))

        if not (_nl_ok(v) or (isinstance(v, dict)
                              and all(_nl_ok(x) for x in v.values()))):
            errors.append(
                f"{type_name} has invalid property 'titles': {v!r}, "
                f"expected a valid natural language property")
    if type_name == "Column" and "name" in obj:
        # reference NAME_SYNTAX (metadata.rb:94,561-564): a name starts
        # with '_col' or an alphanumeric, then [a-zA-Z0-9._]*
        import re
        v = obj["name"]
        if not (isinstance(v, str)
                and re.match(r"^(?:_col|[a-zA-Z0-9])[a-zA-Z0-9._]*$", v)):
            errors.append(
                f"{type_name} has invalid property 'name': {v}, "
                f"expected proper string format")
    scope = {**inherited, **own}
    # both the draft-era 'resources' and W3C-final 'tables' spellings
    # (same alias pair as merge.KEY_ALIASES / load_metadata)
    for t in (obj.get("resources") or obj.get("tables") or []):
        _walk(t, "Table", scope, errors)
    schema = obj.get("tableSchema")
    if isinstance(schema, dict):
        _walk(schema, "Schema", scope, errors)
    for col in obj.get("columns", []) or []:
        _walk(col, "Column", scope, errors)


_CSVW_CONTEXT = "http://www.w3.org/ns/csvw"


def validate_metadata(doc: dict) -> list[str]:
    """→ list of error strings (empty = valid). Driver-side, O(metadata)."""
    errors: list[str] = []
    # W3C csvw-metadata §5.2: a metadata document's @context MUST be the
    # csvw namespace, or an array [csvw, {@base/@language object}]. A
    # naked schema/dialect fragment (no @context key) is allowed — it is
    # referenced FROM a contexted document. (The reference delegates to
    # JSON::LD and accepts any context; kept strict per the spec.)
    if "@context" in doc:
        ctx = doc["@context"]
        ok = (ctx == _CSVW_CONTEXT
              or (isinstance(ctx, list) and len(ctx) in (1, 2)
                  and ctx[0] == _CSVW_CONTEXT
                  and all(isinstance(p, dict)
                          and set(p) <= {"@base", "@language"}
                          for p in ctx[1:])))
        if not ok:
            errors.append(
                f"@context must be {_CSVW_CONTEXT!r} or "
                f"[{_CSVW_CONTEXT!r}, {{@base/@language}}], got {ctx!r}")
    root_type = doc.get("@type")
    if root_type not in _CLASS_PROPS:
        if "resources" in doc or "tables" in doc:
            root_type = "TableGroup"
        elif not ("url" in doc or "tableSchema" in doc or "dialect" in doc) \
                and any(k in doc for k in ("columns", "primaryKey",
                                           "foreignKeys")):
            # a naked schema document (external tableSchema target)
            root_type = "Schema"
        else:
            root_type = "Table"
    _walk(doc, root_type, {}, errors)
    return errors
