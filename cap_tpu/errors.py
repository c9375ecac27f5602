"""Error types (reference src/errors.rs twin)."""


class TxnApiError(Exception):
    """Base error for all CAP transaction-API failures."""


class InvalidParameterError(TxnApiError):
    pass


class FailedSnarkError(TxnApiError):
    pass


class FailedConstraintSystemError(TxnApiError):
    pass


class FailedCredentialCreationError(TxnApiError):
    pass


class FailedCredentialVerificationError(TxnApiError):
    pass


class FailedViewableMemoDecryptionError(TxnApiError):
    pass


class FailedReceiverMemoSignatureError(TxnApiError):
    pass


class FailedTransactionVerificationError(TxnApiError):
    pass


class InvalidAttributeError(TxnApiError):
    pass


class InternalError(TxnApiError):
    pass


class DeserializationError(TxnApiError):
    pass


class IoError(TxnApiError):
    pass
