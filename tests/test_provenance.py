"""Run provenance: cmd.json (flags + git SHA) and src_diff.patch capture
the exact code state of a run — the git-native equivalent of the
reference's rsync source snapshot + cmd.sh (reference
train_tokenizer.py:336-341, train_gpt.py:565-570,
mbrl/train_metaworld_mbpo.py:399-400)."""

import argparse
import json
import os
import subprocess

from ivideogpt_tpu.utils.provenance import write_provenance


def test_write_provenance(tmp_path):
    ns = argparse.Namespace(output_dir="out", lr=3e-4, tags=["a", "b"])
    write_provenance(str(tmp_path), ns)
    prov = json.loads((tmp_path / "cmd.json").read_text())
    assert prov["lr"] == 3e-4 and prov["tags"] == ["a", "b"]
    assert "argv" in prov
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    in_git = subprocess.run(["git", "rev-parse", "HEAD"], cwd=repo,
                            capture_output=True, text=True)
    if in_git.returncode == 0:
        assert prov["git_rev"] == in_git.stdout.strip()
        # src_diff.patch exists iff the tree is dirty
        assert (tmp_path / "src_diff.patch").exists() == prov["git_dirty"]


def test_stale_src_diff_removed(tmp_path, monkeypatch):
    """A rewrite from a clean tree removes the previous dirty run's patch."""
    import ivideogpt_tpu.utils.provenance as prov_mod
    ns = argparse.Namespace(x=1)
    (tmp_path / "src_diff.patch").write_text("old diff")

    def fake_check_output(cmd, cwd=None, text=None):
        return "abc123\n" if "rev-parse" in cmd else ""  # clean tree

    monkeypatch.setattr(prov_mod.subprocess, "check_output",
                        fake_check_output)
    write_provenance(str(tmp_path), ns)
    prov = json.loads((tmp_path / "cmd.json").read_text())
    assert prov["git_dirty"] is False
    assert not (tmp_path / "src_diff.patch").exists()


def test_unknown_git_state_keeps_prior_patch(tmp_path, monkeypatch):
    """git unavailable (git_dirty=None) must NOT delete the previous run's
    patch — it may be the only record of what code ran."""
    import ivideogpt_tpu.utils.provenance as prov_mod
    ns = argparse.Namespace(x=1)
    (tmp_path / "src_diff.patch").write_text("old diff")

    def raising_check_output(cmd, cwd=None, text=None):
        raise FileNotFoundError("no git binary")

    monkeypatch.setattr(prov_mod.subprocess, "check_output",
                        raising_check_output)
    write_provenance(str(tmp_path), ns)
    prov = json.loads((tmp_path / "cmd.json").read_text())
    assert prov["git_dirty"] is None
    assert (tmp_path / "src_diff.patch").read_text() == "old diff"
