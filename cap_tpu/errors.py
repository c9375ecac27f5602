"""Error types — the full 17-variant TxnApiError surface of the reference
(src/errors.rs:25-63) plus the DeserializationError family (:67-72), as a
Python exception hierarchy rooted at TxnApiError."""


class TxnApiError(Exception):
    """Base error for all CAP transaction-API failures."""


class FailedPrimitivesError(TxnApiError):
    """Crypto primitives failed (errors.rs:27)."""


class FailedAssetCodeVerificationError(TxnApiError):
    """AssetCode verification failed (errors.rs:33)."""


class FailedSerializationError(TxnApiError):
    """Failed serialization (errors.rs:41)."""


class FailedTxMemoSignatureError(TxnApiError):
    """Failed transaction-memo signature (errors.rs:45)."""


class IncorrectFeeError(TxnApiError):
    """Incorrect fee collection (errors.rs:55)."""


class ParametersGenerationError(TxnApiError):
    """Parameters generation error (errors.rs:57)."""


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
