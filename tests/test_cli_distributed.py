"""--coordinator/--num-processes/--process-id: the CLI surface of the
reference's init_process_group + mp.spawn launcher (misc.py:390-415,
backbone_train.py:626-631). The real cross-process path runs in
tests/test_multihost.py; here the flag plumbing is checked."""

from types import SimpleNamespace

from sm3x.cli.apps import _maybe_distributed
from sm3x.cli.parser import get_parser


def test_parser_accepts_coordinator_flags():
    args = get_parser().parse_args(
        ["--coordinator", "10.0.0.1:1234", "--num-processes", "4",
         "--process-id", "2"])
    assert args.coordinator == "10.0.0.1:1234"
    assert args.num_processes == 4 and args.process_id == 2


def test_maybe_distributed_calls_initialize(monkeypatch):
    import sm3x.parallel as par

    calls = []
    monkeypatch.setattr(par, "distributed_initialize",
                        lambda addr, n, pid: calls.append((addr, n, pid)))
    args = SimpleNamespace(coordinator="h:1", num_processes=2, process_id=1,
                           log_path="/tmp/x")
    _maybe_distributed(args)
    assert calls == [("h:1", 2, 1)]
    # single-process in this test: process_index()==0 keeps log_path
    assert args.log_path == "/tmp/x"


def test_maybe_distributed_noop_without_flag():
    args = SimpleNamespace(coordinator=None, log_path="/tmp/x")
    _maybe_distributed(args)  # must not touch jax.distributed
    assert args.log_path == "/tmp/x"
