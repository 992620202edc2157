"""Unit tests for reference-semantics scalar functions
(doctest examples lifted from the reference's documented behaviour)."""

from ferenda_ray.functions import (
    base27decode,
    base27encode,
    booleanvalue,
    firstletter,
    from_roman,
    increment,
    is_roman,
    natsort_key,
    normalize_space,
    slugify,
    split_numalpha,
    title_sortkey,
    to_roman,
    uri_leaf,
    year_of,
)


def test_normalize_space():
    assert normalize_space(" This is  a long \n string\n") == "This is a long string"
    assert normalize_space("a\xa0b") == "a b"
    assert normalize_space("   ") == ""


def test_title_sortkey():
    assert title_sortkey("The 'viewstate' property") == "viewstateproperty"
    assert title_sortkey("A Tale of Two Cities") == "ataleoftwocities"


def test_split_numalpha():
    assert split_numalpha("10 a §") == ["", 10, " a §"]
    assert split_numalpha("squared²") == ["squared²"]
    assert sorted(["2 §", "10 §", "1 §"], key=split_numalpha) == ["1 §", "2 §", "10 §"]
    assert split_numalpha("") == []


def test_natsort():
    # numcmp semantics: "10" > "2", "2" < "2 a", "3" > "2 a"
    assert natsort_key("10") > natsort_key("2")
    assert natsort_key("2") < natsort_key("2 a")
    assert natsort_key("3") > natsort_key("2 a")


def test_uri_leaf():
    assert uri_leaf("http://purl.org/dc/terms/title") == "title"
    assert uri_leaf("http://www.w3.org/2004/02/skos/core#Concept") == "Concept"
    assert uri_leaf("http://www.w3.org/2004/02/skos/core#") is None


def test_facet_selectors():
    assert firstletter("A Tale of Two Cities") == "a"
    assert firstletter("---") == "-"
    assert year_of("1859-04-30") == "1859"
    assert year_of("2014-06") == "2014"
    assert year_of("2014-06-05T12:00:00") == "2014"
    assert booleanvalue("true") is True
    assert booleanvalue("false") is False
    assert booleanvalue(True) is True
    assert slugify("A Tale of Two Cities") == "a-tale-of-two-cities"


def test_roman():
    assert from_roman("MCMLXXXIV") == 1984
    assert to_roman(1984) == "MCMLXXXIV"
    assert to_roman(4, lower=True) == "iv"
    assert is_roman("xiv")
    assert not is_roman("xyz")
    assert not is_roman("")
    assert increment("vi") == "vii"
    assert increment(6) == 7


def test_base27():
    # reference directions (util.py:840-849): encode str→int, decode int→str
    assert base27encode("a") == 1
    assert base27encode(base27decode(12345)) == 12345
    assert base27decode(0) == " "
    assert base27decode(base27encode("abc")) == "abc"


def test_canonical_url():
    from ferenda_ray.functions.url import canonical_url as c

    assert c("https://WWW.Ex.org/A/B") == "https://www.ex.org/A/B"
    assert c("http://h.org:80/x") == "http://h.org/x"
    assert c("https://h.org:443") == "https://h.org"
    assert c("https://h.org:8443/x") == "https://h.org:8443/x"
    assert c("http://h.org:443/x") == "http://h.org:443/x"  # wrong scheme
    assert c("https://h.org/x#frag") == "https://h.org/x"
    assert c("https://h.org/x?utm_source=a&id=3&gclid=z") == \
        "https://h.org/x?id=3"
    assert c("https://h.org/x?utm_source=a") == "https://h.org/x"
    assert c("https://h.org/x/") == "https://h.org/x"
    assert c("https://h.org/x///") == "https://h.org/x"
    assert c("") == ""
    # path/query case preserved; only authority lowercased
    assert c("https://H.org/Path?Q=V") == "https://h.org/Path?Q=V"
    # fragment removed before trailing-slash strip
    assert c("https://h.org/x/#s") == "https://h.org/x"
