from sejonggo_tpu.ops.flood import flood_fixpoint_pallas, enable_pallas_flood
