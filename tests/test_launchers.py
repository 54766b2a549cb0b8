"""The four top-level .sh entry points (reference README quick-start parity:
/root/reference/{infer_omgsr_s.sh,infer_omgsr_f.sh,train_omgsr_s_512.sh,
train_omgsr_f_1024.sh}) must keep pointing at real modules with flags their
argparse parsers accept — this guards the scripts against CLI drift without
spawning a subprocess."""

import importlib
import re
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

LAUNCHERS = {
    "infer_omgsr_s.sh": "omgsr_tpu.cli.infer_omgsr_s",
    "infer_omgsr_f.sh": "omgsr_tpu.cli.infer_omgsr_f",
    "train_omgsr_s_512.sh": "omgsr_tpu.cli.train_omgsr_s",
    "train_omgsr_f_1024.sh": "omgsr_tpu.cli.train_omgsr_f",
}


def _parse_script(name):
    text = (ROOT / name).read_text()
    code = "\n".join(
        ln for ln in text.splitlines() if not ln.lstrip().startswith("#")
    )
    mod = re.search(r"python -m (\S+)", code).group(1)
    flags = re.findall(r"(--[a-z_]+)(?:\s+([^\s\\]+))?", code)
    return text, mod, flags


@pytest.mark.parametrize("name,module", sorted(LAUNCHERS.items()))
def test_launcher_matches_cli(name, module):
    text, mod, flags = _parse_script(name)
    assert mod == module
    assert '"$@"' in text, "launchers must forward extra args (override support)"

    cli = importlib.import_module(module)
    if name.startswith("infer"):
        argv = []
        for f, v in flags:
            argv += [f, v] if v and not v.startswith("--") else [f]
        args = cli.parse_args(argv)
        assert args.upscale == 4 and args.align_method == "adain"
        assert args.mid_timestep in (273, 244)
    else:
        cfg = re.search(r"--config (\S+)", text).group(1)
        # defaults are pinned to the repo via $REPO_DIR (user relative
        # overrides resolve against the invocation cwd, like the reference)
        cfg = cfg.strip('"').replace("$REPO_DIR/", "").lstrip("./")
        assert (ROOT / cfg).is_file(), f"{cfg} missing"
        # the train CLIs build their parser inside main (--config + overrides)
        assert hasattr(cli, "main")
