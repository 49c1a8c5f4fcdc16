"""URI-template expansion tests (reference: spec/metadata_spec.rb:614-687
URI template behavior, fixture usage in spec/data/countries.json:9,22)."""

from rdf_tabular_spark.csvw.uri_template import expand


def test_simple():
    assert expand("#gid-{GID}", {"GID": "1"}) == "#gid-1"


def test_fragment_name():
    assert expand("{#_name}", {"_name": "countryCode"}) == "#countryCode"


def test_fragment_encodes_space_and_utf8():
    assert expand("{#_name}", {"_name": "Payscale Minimum (£)"}) == "#Payscale%20Minimum%20(%C2%A3)"


def test_reserved_op_keeps_reserved():
    assert expand("{+url}", {"url": "http://a/b?c=d"}) == "http://a/b?c=d"


def test_simple_encodes_reserved():
    assert expand("{v}", {"v": "a/b c"}) == "a%2Fb%20c"


def test_query_op():
    assert expand("{?x,y}", {"x": "1", "y": "2"}) == "?x=1&y=2"


def test_missing_var_omitted():
    assert expand("{#x}", {}) == ""
    assert expand("a{x}b", {}) == "ab"


def test_literal_passthrough():
    assert expand("http://schema.org/{_name}", {"_name": "latitude"}) == "http://schema.org/latitude"


def test_list_value():
    assert expand("{v}", {"v": ["a", "b"]}) == "a,b"


def test_prefix_modifier():
    assert expand("{v:2}", {"v": "abcdef"}) == "ab"


def test_numeric_binding():
    assert expand("#row-{_row}", {"_row": 3}) == "#row-3"
