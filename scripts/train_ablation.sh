#!/bin/bash
# EGC-S head/base ablation grids (reference train_ablation.sh):
# constant parameter count (~100K) and constant hidden (128).
set -e
DIR="${1:-./retrained_models}"
RUNS="${RUNS:-10}"

run() { python main.py "$@" --final-runs "${RUNS}" --aggrs symadd; }

# Constant parameter count
run "${DIR}/param_ablation/h4b4"   egc zinc --hidden 136 --egc-num-heads 4  --egc-num-bases 4  --hparams "{'lr': 0.002280874077442256, 'batch_size': 128, 'wd': 0.00016983733932965093}"
run "${DIR}/param_ablation/h4b8"   egc zinc --hidden 100 --egc-num-heads 4  --egc-num-bases 8  --hparams "{'lr': 0.002157056978525518, 'batch_size': 64, 'wd': 0.0006505102634046523}"
run "${DIR}/param_ablation/h4b16"  egc zinc --hidden 68  --egc-num-heads 4  --egc-num-bases 16 --hparams "{'lr': 0.007475759228858606, 'batch_size': 128, 'wd': 0.00018261215555152014}"
run "${DIR}/param_ablation/h8b4"   egc zinc --hidden 168 --egc-num-heads 8  --egc-num-bases 4  --hparams "{'lr': 0.00278434576243951, 'batch_size': 64, 'wd': 0.00015614444389379077}"
run "${DIR}/param_ablation/h8b8"   egc zinc --hidden 120 --egc-num-heads 8  --egc-num-bases 8  --hparams "{'lr': 0.001406514441546532, 'batch_size': 64, 'wd': 0.00029544213504303457}"
run "${DIR}/param_ablation/h8b16"  egc zinc --hidden 80  --egc-num-heads 8  --egc-num-bases 16 --hparams "{'lr': 0.0036797253125154775, 'batch_size': 128, 'wd': 0.00027104079055315436}"
run "${DIR}/param_ablation/h16b4"  egc zinc --hidden 176 --egc-num-heads 16 --egc-num-bases 4  --hparams "{'lr': 0.002931923031986728, 'batch_size': 128, 'wd': 0.00013034058509380351}"
run "${DIR}/param_ablation/h16b8"  egc zinc --hidden 112 --egc-num-heads 16 --egc-num-bases 8  --hparams "{'lr': 0.003643084029023136, 'batch_size': 128, 'wd': 0.00014767545119931004}"
run "${DIR}/param_ablation/h16b16" egc zinc --hidden 64  --egc-num-heads 16 --egc-num-bases 16 --hparams "{'lr': 0.0022159422474374592, 'batch_size': 64, 'wd': 0.0001148037568072897}"

# Constant hidden = 128
run "${DIR}/headbase_ablation/h4b4"   egc zinc --hidden 128 --egc-num-heads 4  --egc-num-bases 4  --hparams "{'lr': 0.003148181818571187, 'batch_size': 128, 'wd': 0.0006299893259191312}"
run "${DIR}/headbase_ablation/h4b8"   egc zinc --hidden 128 --egc-num-heads 4  --egc-num-bases 8  --hparams "{'lr': 0.003723003115072577, 'batch_size': 64, 'wd': 0.000187218003891752}"
run "${DIR}/headbase_ablation/h4b16"  egc zinc --hidden 128 --egc-num-heads 4  --egc-num-bases 16 --hparams "{'lr': 0.0012547863658416598, 'batch_size': 128, 'wd': 0.00018530057376373087}"
run "${DIR}/headbase_ablation/h8b4"   egc zinc --hidden 128 --egc-num-heads 8  --egc-num-bases 4  --hparams "{'lr': 0.008610092880667053, 'batch_size': 128, 'wd': 0.00010134943833468606}"
run "${DIR}/headbase_ablation/h8b8"   egc zinc --hidden 128 --egc-num-heads 8  --egc-num-bases 8  --hparams "{'lr': 0.006047352685362815, 'batch_size': 128, 'wd': 0.00021038377802130008}"
run "${DIR}/headbase_ablation/h8b16"  egc zinc --hidden 128 --egc-num-heads 8  --egc-num-bases 16 --hparams "{'lr': 0.0013731703674031866, 'batch_size': 64, 'wd': 0.0002327872787400411}"
run "${DIR}/headbase_ablation/h16b4"  egc zinc --hidden 128 --egc-num-heads 16 --egc-num-bases 4  --hparams "{'lr': 0.00213094731168947, 'batch_size': 64, 'wd': 0.000862134262819252}"
run "${DIR}/headbase_ablation/h16b8"  egc zinc --hidden 128 --egc-num-heads 16 --egc-num-bases 8  --hparams "{'lr': 0.004052115476867187, 'batch_size': 64, 'wd': 0.00014627932774578965}"
run "${DIR}/headbase_ablation/h16b16" egc zinc --hidden 128 --egc-num-heads 16 --egc-num-bases 16 --hparams "{'lr': 0.002873665274991742, 'batch_size': 64, 'wd': 0.00013305870959268287}"
