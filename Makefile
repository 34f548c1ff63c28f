# hulc_tpu common workflows
PY := PYTHONPATH=$(CURDIR):$$PYTHONPATH python

.PHONY: test bench smoke dryrun dryrun-fullsize dryrun-multihost native eval-smoke profile annotate-smoke shm-scale converge echo-quality fetch-demo protocol-eval protocol-expert epoch-scale echo-converge moments-study protocol-policy

test:            ## full suite (CPU, 8 virtual devices)
	python -m pytest tests/ -q

bench:           ## headline throughput on the real chip (one JSON line)
	$(PY) bench.py

smoke:           ## 5-step fixture training end-to-end
	$(PY) -m hulc_tpu.training.train --config gcbc_debug --fixture --steps 5 \
	    --batch-size 2 --run-dir /tmp/hulc_smoke --cache none --no-resume

dryrun:          ## multi-chip sharding dryrun on 8 virtual CPU devices
	JAX_PLATFORMS= $(PY) -c "import jax; jax.config.update('jax_platforms','cpu'); \
	    import os; os.environ['XLA_FLAGS']=os.environ.get('XLA_FLAGS','')+' --xla_force_host_platform_device_count=8'; \
	    from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

dryrun-fullsize: ## FULL-SIZE dp/fsdp/tp4/sp2 sharding parity (slow; receipt: FULLSIZE_DRYRUN_r05.txt)
	HULC_DRYRUN_FULLSIZE=1 $(PY) -c "from __graft_entry__ import dryrun_multichip; \
	    dryrun_multichip(8)" 2>&1 | tee FULLSIZE_DRYRUN_r05.txt

dryrun-multihost: ## 2-process DCN dryrun (disjoint batch halves, loss parity)
	$(PY) -c "from __graft_entry__ import dryrun_multihost; dryrun_multihost(2)"

native:          ## (re)build the C++ shared-memory cache
	$(PY) -m hulc_tpu.native.build

shm-scale:       ## populate + gather an 8 GB /dev/shm arena (integrity checked)
	$(PY) scripts/shm_scale_test.py --gb 8

fetch-demo:      ## real-physics e2e: MuJoCo Fetch collect->train->closed-loop eval
	MUJOCO_GL=egl $(PY) scripts/fetch_demo.py all --root /tmp/fetch_demo \
	    --episodes 1000 --steps 6000 --eval-episodes 50

converge:        ## train->select->eval->plot on the real chip, loss asserts
	$(PY) scripts/converge.py

protocol-eval:   ## full 1000-chain LH-MTLC protocol receipts (chip policy, 64 lanes)
	$(PY) scripts/protocol_eval.py

protocol-expert: ## official 1000-chain protocol, scripted expert on the interactive playtable (no chip)
	$(PY) scripts/protocol_eval.py --expert --out PROTOCOL_EXPERT.json

epoch-scale:     ## multi-GB split + full-epoch loader->preprocess->device measurement
	$(PY) scripts/epoch_scale.py --keep-data

echo-quality:    ## data-echoing quality cost table (echo 1/4/16, same steps)
	$(PY) scripts/echo_quality.py

echo-converge:   ## echo {1,8} x 2 seeds at FLAGSHIP shapes (batch 32+32, window 32)
	$(PY) scripts/echo_converge.py --steps 500 --batch-size 32 --window 32 \
	    --work-dir /tmp/hulc_echo_flagship

moments-study:   ## adam moment-dtype certification at FLAGSHIP shapes (same-seed f32 vs bf16)
	$(PY) scripts/moments_study.py --steps 500 --batch-size 32 --window 32 \
	    --work-dir /tmp/hulc_moments_flagship

protocol-policy: ## learn-to-succeed loop: expert play data -> train -> 1000-chain protocol
	$(PY) scripts/playtable_policy.py all --root /tmp/playtable --chains 300 --steps 6000

eval-smoke:      ## batched LH-MTLC smoke on the fake env
	$(PY) -m hulc_tpu.evaluation.evaluate --run-dir /tmp/hulc_smoke \
	    --config gcbc_debug --num-sequences 4 --ep-len 5 --batched --num-envs 2

profile:         ## op-level TPU profile of the train step (top ops by time)
	$(PY) scripts/profile_step.py

annotate-smoke:  ## oracle-driven language annotation on a fixture split
	$(PY) -c "from hulc_tpu.data.fixtures import make_fixture_dataset; \
	    make_fixture_dataset('/tmp/hulc_ann_fixture')"
	$(PY) -m hulc_tpu.data.language --data /tmp/hulc_ann_fixture/training \
	    --lang-folder lang_annotated --window 16 --prior-steps-window 8 --stride 4
