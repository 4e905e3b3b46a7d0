"""Configuration parser tests (mirrors reference test/configuration_test.cc)."""

import os

import pytest

from pocketkaldi_tpu.config import Configuration
from pocketkaldi_tpu.errors import CorruptionError


def test_reference_fixture(reference_data_dir):
    conf = Configuration.read(os.path.join(reference_data_dir, "test.conf"))
    # Keys are lowercased (configuration.cc:41)
    assert conf.get_string("testconf") == "test_conf.txt"
    assert conf.get_integer("int_val") == 1
    # Relative paths resolve against the config's own directory
    path = conf.get_path("testconf")
    assert path == os.path.join(reference_data_dir, "test_conf.txt")
    assert os.path.exists(path)


def test_parse_rules(tmp_path):
    p = tmp_path / "a.conf"
    p.write_text("# comment\n\n  Key1 = value1  \nKEY2=2\n")
    conf = Configuration.read(str(p))
    assert conf.get_string("key1") == "value1"
    assert conf.get_integer("key2") == 2
    assert conf.get_string("missing", "dflt") == "dflt"
    with pytest.raises(CorruptionError):
        conf.get_string("missing")


def test_bad_lines(tmp_path):
    p = tmp_path / "bad.conf"
    p.write_text("key value without equals\n")
    with pytest.raises(CorruptionError):
        Configuration.read(str(p))
    p.write_text("key =\n")
    with pytest.raises(CorruptionError):
        Configuration.read(str(p))


def test_absolute_path_passthrough(tmp_path):
    p = tmp_path / "abs.conf"
    p.write_text("model = /abs/path.bin\n")
    conf = Configuration.read(str(p))
    assert conf.get_path("model") == "/abs/path.bin"
