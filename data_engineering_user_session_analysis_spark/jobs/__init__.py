"""End-to-end jobs mirroring the reference's orchestration contract
(stream → partitioned lake → daily batch → serving tables)."""
