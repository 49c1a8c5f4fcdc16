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


def test_rfc6570_spec_examples():
    """The RFC 6570 §3.2 example corpus (Levels 1-3 subset the CSVW
    processor uses) verbatim — one table, 22 expansions."""
    from rdf_tabular_spark.csvw.uri_template import expand
    cases = [
        ("{var}", {"var": "value"}, "value"),
        ("{hello}", {"hello": "Hello World!"}, "Hello%20World%21"),
        ("{+var}", {"var": "value"}, "value"),
        ("{+hello}", {"hello": "Hello World!"}, "Hello%20World!"),
        ("{+path}/here", {"path": "/foo/bar"}, "/foo/bar/here"),
        ("{#var}", {"var": "value"}, "#value"),
        ("{#hello}", {"hello": "Hello World!"}, "#Hello%20World!"),
        ("map?{x,y}", {"x": "1024", "y": "768"}, "map?1024,768"),
        ("{x,hello,y}", {"x": "1024", "hello": "Hello World!", "y": "768"},
         "1024,Hello%20World%21,768"),
        ("{+x,hello,y}", {"x": "1024", "hello": "Hello World!", "y": "768"},
         "1024,Hello%20World!,768"),
        ("{#x,hello,y}", {"x": "1024", "hello": "Hello World!", "y": "768"},
         "#1024,Hello%20World!,768"),
        ("X{.var}", {"var": "value"}, "X.value"),
        ("{/var}", {"var": "value"}, "/value"),
        ("{/var,x}/here", {"var": "value", "x": "1024"}, "/value/1024/here"),
        ("{;x,y}", {"x": "1024", "y": "768"}, ";x=1024;y=768"),
        ("{;x,y,empty}", {"x": "1024", "y": "768", "empty": ""},
         ";x=1024;y=768;empty"),
        ("{?x,y}", {"x": "1024", "y": "768"}, "?x=1024&y=768"),
        ("{?x,y,empty}", {"x": "1024", "y": "768", "empty": ""},
         "?x=1024&y=768&empty="),
        ("?fixed=yes{&x}", {"x": "1024"}, "?fixed=yes&x=1024"),
        ("{var:3}", {"var": "value"}, "val"),
        ("{semi}", {"semi": ";"}, "%3B"),
        ("{semi:2}", {"semi": ";"}, "%3B"),
    ]
    for tmpl, binds, want in cases:
        assert expand(tmpl, binds) == want, (tmpl, binds)
