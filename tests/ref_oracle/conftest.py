import pytest

from . import refbridge

collect_ignore_glob = ['_shim/*']

if not refbridge.reference_available():
    collect_ignore_glob.append('test_*')


@pytest.fixture(scope='session', autouse=True)
def _bridge():
    refbridge.setup()
