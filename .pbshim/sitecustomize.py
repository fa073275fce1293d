"""TEST-ONLY shim: expose the google-cloud-sdk's vendored pure-python
protobuf (6.32.0) to pyspark's transformWithState wire protocol, relaxing
protobuf's runtime>=gencode validation for the one-minor-version gap
(pyspark 4.1.2 gencode 6.33.0). Used exclusively by the TWS parity test
via a subprocess PYTHONPATH; never imported by product code, which keeps
its ImportError gate for normal environments."""
import sys

_VENDORED = "/usr/lib/google-cloud-sdk/platform/google_appengine"
if _VENDORED not in sys.path:
    sys.path.append(_VENDORED)
try:
    from google.protobuf import runtime_version as _rv

    _orig = _rv.ValidateProtobufRuntimeVersion

    def _lenient(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location):
        try:
            _orig(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location)
        except _rv.VersionError:
            # same major, runtime one minor behind gencode: the
            # StateMessage wire format is unchanged across 6.32/6.33 and
            # the TWS parity test asserts end-to-end correctness anyway
            if not (gen_major == _rv.MAJOR and gen_minor <= _rv.MINOR + 1):
                raise

    _rv.ValidateProtobufRuntimeVersion = _lenient
except ImportError:
    pass
