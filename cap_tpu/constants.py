"""Framework-wide constants (reference src/constants.rs twin)."""

#: number of identity attributes in a credential (constants.rs:29)
ATTRS_LEN = 8
#: reveal map bits: (upk_x, upk_y, amount, blind) use the first 4 internal
#: bits; one per attribute after that.  The reference exposes this as
#: 3 + ATTRS_LEN user-facing bits (upk counts once) over a 12-bit internal
#: bitmap (constants.rs:18, src/structs.rs:453-461).
REVEAL_MAP_LEN = 3 + ATTRS_LEN
#: internal bitmap width = len(viewable data per input record)
VIEWABLE_DATA_LEN = REVEAL_MAP_LEN + 1  # 12
#: max bit-length of (expiry - valid_until) range checks (constants.rs:33)
MAX_TIMESTAMP_LEN = 20
#: amount values are < 2^AMOUNT_LEN (constants.rs:36)
AMOUNT_LEN = 127
AMOUNT_MAX = (1 << AMOUNT_LEN) - 1

DOM_SEP_DOMESTIC_ASSET = b"DOMESTIC_ASSET"
DOM_SEP_FOREIGN_ASSET = b"FOREIGN_ASSET"

#: native asset code (config.rs:62) and dummy asset code (config.rs:67)
NATIVE_ASSET_CODE = 1
DUMMY_ASSET_CODE = 2

#: per-attribute byte capacity (config.rs:56-58)
PER_ATTR_BYTE_CAPACITY = 30
