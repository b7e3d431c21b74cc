"""Config unit tests (parity behaviors from reference tests/test_config.py)."""

from __future__ import annotations

from pypers_spark.config import Config


def test_path_key_set_get():
    c = Config()
    c["stage1/param1"] = 1000
    c["stage2/sub/param2"] = "xyz"
    assert c["stage1/param1"] == 1000
    assert c["stage2/sub/param2"] == "xyz"
    assert c.entries == {"stage1": {"param1": 1000}, "stage2": {"sub": {"param2": "xyz"}}}


def test_get_sets_default():
    c = Config()
    assert c.get("a/b", 5) == 5
    assert c["a/b"] == 5


def test_pop():
    c = Config({"a": {"b": 1, "c": 2}})
    assert c.pop("a/b", None) == 1
    assert "a/b" not in c
    assert c.pop("a/missing", "dflt") == "dflt"


def test_set_default_and_override_none():
    c = Config({"x": None})
    assert c.set_default("x", 3) is None  # None counts as set
    assert c.set_default("x", 3, override_none=True) == 3
    assert c.set_default("y/z", 7) == 7


def test_update():
    c = Config({"n": 2})
    assert c.update("n", lambda v: v * 10) == 20
    assert c.update("fresh", lambda v: 1 if v is None else 2) == 1


def test_merge_deep():
    a = Config({"s": {"x": 1, "y": 2}, "top": 0})
    b = Config({"s": {"y": 3, "z": 4}})
    a.merge(b)
    assert a.entries == {"s": {"x": 1, "y": 3, "z": 4}, "top": 0}


def test_copy_is_deep():
    a = Config({"s": {"x": 1}})
    b = a.copy()
    b["s/x"] = 2
    assert a["s/x"] == 1


def test_contains():
    c = Config({"a": {"b": 1}})
    assert "a/b" in c
    assert "a/z" not in c
    assert "z" not in c


def test_nested_config_wrapping():
    c = Config({"a": {"b": {"c": 1}}})
    sub = c["a"]
    assert isinstance(sub, Config)
    assert sub["b/c"] == 1


def test_sha_stability_and_sensitivity():
    c1 = Config({"a": 1})
    c2 = Config({"a": 1})
    c3 = Config({"a": 2})
    assert c1.sha.hexdigest() == c2.sha.hexdigest()
    assert c1.sha.hexdigest() != c3.sha.hexdigest()


def test_yaml_rendering():
    c = Config()
    c["stage1/param1"] = 1000
    c["stage1/sub/param1"] = "xyz"
    assert c.yaml == "stage1:\n  param1: 1000\n  sub:\n    param1: 'xyz'"


def test_eq():
    assert Config({"a": 1}) == Config({"a": 1})
    assert Config({"a": 1}) != Config({"a": 2})
