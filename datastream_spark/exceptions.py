"""Exception hierarchy preserved from the reference API contract.

Parity target: datastream/exceptions.py:~10-70 (names [HIGH], see
SURVEY.md §3). The reference raises these from its MongoDB backend; we
raise them from driver-side validation around Spark jobs.
"""


class DatastreamException(Exception):
    """Base class for all datastream errors."""


class StreamNotFound(DatastreamException):
    """No stream matches the given query tags / stream_id."""


class MultipleStreamsReturned(DatastreamException):
    """Query tags matched more than one stream where one was expected."""


class InconsistentStreamConfiguration(DatastreamException):
    """ensure_stream called with configuration conflicting an existing stream."""


class OutstandingDependenciesError(DatastreamException):
    """Stream cannot be deleted because derived streams depend on it."""


class UnsupportedDownsampler(DatastreamException):
    """Unknown value/time downsampler name."""


class UnsupportedGranularity(DatastreamException):
    """Unknown granularity name."""


class UnsupportedDeriveOperator(DatastreamException):
    """Unknown derive operator name."""


class InvalidTimestamp(DatastreamException):
    """Timestamp is non-UTC-coercible, far-future, or non-monotonic."""


class IncompatibleGranularities(DatastreamException):
    """Derived stream granularity is finer than a source's granularity."""


class IncompatibleTypes(DatastreamException):
    """Derive operator applied to an unsupported value type."""


class AppendToDerivedStreamNotAllowed(DatastreamException):
    """Datapoints of derived streams are computed, not appended."""


class InvalidOperatorArguments(DatastreamException):
    """derive_args malformed for the chosen derive operator."""


class StreamAppendContended(DatastreamException):
    """Concurrent append contention (single-writer discipline violated)."""


class DownsampleConsistencyNotGuaranteed(UserWarning):
    """Warning: downsampling ran in a mode that may observe partial state."""
