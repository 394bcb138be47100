"""Rootdir conftest: CLI options must be registered here so that bare
``pytest --slow`` works from the repo root (plugins in sub-directory
conftests only register options when that directory is an initial
command-line path)."""


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (full lane; ~1 h on 1 CPU)",
    )
