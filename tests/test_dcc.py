"""DCC export parity: the generated .mtd/AE templates must cover everything
the reference's hand-written ones declare (src/rlShaders.mtd:1-64,
scripts/ae/rl*Template.py)."""
import ast
import os
import re

import pytest

from rlshaders_tpu.models import dcc
from rlshaders_tpu.models.registry import SHADERS

REF_MTD = "/root/reference/src/rlShaders.mtd"
REF_AE = "/root/reference/scripts/ae"


def _parse_mtd(text):
    """{node: {"meta": {...}, "attrs": {attr: {key: value}}}}"""
    nodes = {}
    node = attr = None
    for line in text.splitlines():
        s = line.strip()
        if not s:
            continue
        m = re.match(r"\[node (\w+)\]", s)
        if m:
            node = nodes.setdefault(m.group(1), {"meta": {}, "attrs": {}})
            attr = None
            continue
        m = re.match(r"\[attr (\w+)\]", s)
        if m:
            attr = node["attrs"].setdefault(m.group(1), {})
            continue
        m = re.match(r"([\w.]+)\s+(STRING|INT|FLOAT|BOOL)\s+(.*)", s)
        if m:
            key, typ, raw = m.groups()
            raw = raw.strip().strip('"')
            val = (int(raw, 0) if typ == "INT"
                   else float(raw) if typ == "FLOAT"
                   else raw == "true" if typ == "BOOL" else raw)
            (attr if attr is not None else node["meta"])[key] = val
    return nodes


def test_mtd_round_trips_through_parser():
    ours = _parse_mtd(dcc.generate_mtd())
    assert set(ours) == {"rlGgx", "rlDisney", "rlSkin"}
    for name, blk in ours.items():
        assert blk["meta"]["maya.id"] == SHADERS[name].maya_id
        assert blk["meta"]["maya.classification"] == "shader/surface"


@pytest.mark.skipif(not os.path.exists(REF_MTD), reason="no reference")
def test_mtd_covers_reference_metadata():
    ref = _parse_mtd(open(REF_MTD).read())
    ours = _parse_mtd(dcc.generate_mtd())
    assert set(ours) >= set(ref)
    for node, blk in ref.items():
        assert ours[node]["meta"]["maya.id"] == blk["meta"]["maya.id"], node
        for attr, rows in blk["attrs"].items():
            assert attr in ours[node]["attrs"], f"{node}.{attr} missing"
            for key, val in rows.items():
                got = ours[node]["attrs"][attr].get(key)
                assert got is not None, f"{node}.{attr}.{key} missing"
                if key == "min":
                    assert got == val, (node, attr, key)
                else:  # our softmax/max may be tighter, never looser=None
                    assert isinstance(got, float), (node, attr, key)


def _ae_controls(src):
    """Attrs referenced by addControl(...) calls in an AE template."""
    tree = ast.parse(src)
    out = set()
    for n in ast.walk(tree):
        if (isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)
                and n.func.attr == "addControl" and n.args
                and isinstance(n.args[0], ast.Constant)):
            out.add(n.args[0].value)
    return out


def test_ae_templates_parse_and_match_schema():
    for name in ("rlGgx", "rlDisney", "rlSkin"):
        src = dcc.generate_ae_template(SHADERS[name])
        controls = _ae_controls(src)
        assert controls, name
        schema = {p.name for p in SHADERS[name].params}
        assert controls <= schema, (name, controls - schema)


@pytest.mark.skipif(not os.path.isdir(REF_AE), reason="no reference")
def test_ae_templates_cover_reference_controls():
    for name in ("rlGgx", "rlDisney", "rlSkin"):
        ref_path = os.path.join(REF_AE, f"{name}Template.py")
        if not os.path.exists(ref_path):
            continue
        ref_controls = _ae_controls(open(ref_path).read())
        # only attrs that exist in our schema are comparable (the reference
        # AE may name Maya-side helpers); every schema attr it lays out must
        # be laid out by ours too
        schema = {p.name for p in SHADERS[name].params}
        ours = _ae_controls(dcc.generate_ae_template(SHADERS[name]))
        missing = (ref_controls & schema) - ours
        assert not missing, (name, missing)


def test_export_writes_files(tmp_path):
    paths = dcc.export(str(tmp_path))
    assert any(p.endswith("rlShaders.mtd") for p in paths)
    assert sum(p.endswith("Template.py") for p in paths) == 3
    for p in paths:
        assert os.path.getsize(p) > 100
