from duet_tpu.sim.simulate import SimConfig, SimTruth, simulate_dataset
