"""The provenance-stamped result writer (bench/results.py).

Round-3 verdict weak #2: ``--quick`` CPU smoke runs overwrote canonical
hardware artifacts and results carried no backend provenance. The writer
must (a) stamp every JSON with backend/devices/quick/argv, and (b) refuse
the canonical path for quick runs.
"""
import json

from sparta_tpu.bench.results import provenance, quick_path, write_result


def test_quick_run_refuses_canonical_path(tmp_path):
    canon = tmp_path / "probe.json"
    canon.write_text(json.dumps({"hw": True}))
    written = write_result(canon, {"cpu_smoke": 1}, quick=True)
    assert written == tmp_path / "probe_quick.json"
    # the canonical hardware artifact is untouched
    assert json.loads(canon.read_text()) == {"hw": True}
    doc = json.loads(written.read_text())
    assert doc["cpu_smoke"] == 1
    assert doc["_provenance"]["quick"] is True


def test_provenance_stamp_fields(tmp_path):
    p = write_result(tmp_path / "r.json", {"x": 2})
    doc = json.loads(p.read_text())
    prov = doc["_provenance"]
    assert prov["quick"] is False
    assert "backend" in prov and "devices" in prov and "timestamp" in prov
    # the CPU test backend must be identifiable as such in the stamp
    assert prov["backend"] == "cpu"


def test_non_dict_payload_wrapped(tmp_path):
    p = write_result(tmp_path / "lst.json", [1, 2, 3])
    doc = json.loads(p.read_text())
    assert doc["data"] == [1, 2, 3]
    assert "_provenance" in doc


def test_hw_only_reroutes_cpu_backend(tmp_path):
    canon = tmp_path / "probe.json"
    canon.write_text(json.dumps({"hw": True}))
    written = write_result(canon, {"cpu_full": 1}, hw_only=True)
    # test backend is cpu -> canonical hardware artifact stays untouched
    assert written == tmp_path / "probe_cpu.json"
    assert json.loads(canon.read_text()) == {"hw": True}


def test_quick_path_helper():
    assert quick_path("results/knobs_probe.json").name == \
        "knobs_probe_quick.json"


def test_provenance_callable_without_jax_failure():
    stamp = provenance(quick=True)
    assert stamp["quick"] is True
