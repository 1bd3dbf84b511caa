from sejonggo_tpu.ops.flood import flood_fixpoint_pallas, enable_pallas_flood
from sejonggo_tpu.ops.gostep import step_legal_pallas, enable_pallas_gostep
