"""Classical control suite tests: PID core semantics + closed-loop behavior.

No numeric goldens exist for the reference controllers (they hardcode
cuda:0 and cannot run here), so the contract is behavioral: the full
PID+TECS+L1 stack flown closed-loop on the F-16 dynamics must capture a
demanded heading and hold demanded altitude/airspeed - the same hierarchical
control role it plays in the reference combat envs
(`envs/singlecombat_env.py:240-261`) and `renders/render_control.py`.
"""
import jax
import jax.numpy as jnp
import numpy as np

from neuralplane_tpu.algorithms.pid import (Controller, FlightData, PIDGains,
                                            flight_data, pid_init,
                                            pid_update_all)
from neuralplane_tpu.envs import ControlEnv
from neuralplane_tpu.utils.math import wrap_PI


def test_pid_core_semantics():
    g = PIDGains(Kp=2.0, Ki=1.0, Kd=0.1, Kff=0.5, Kimax=0.3, dt=0.1)
    st = pid_init(3)
    target = jnp.array([1.0, -1.0, 0.0])
    meas = jnp.zeros(3)
    no_limit = jnp.zeros(3, bool)

    # first call: derivative must be 0 (reset latch), integrator = e*Ki*dt
    st, out = pid_update_all(g, st, target, meas, no_limit)
    np.testing.assert_allclose(np.asarray(st.derivative), 0.0)
    np.testing.assert_allclose(np.asarray(st.integrator),
                               np.array([0.1, -0.1, 0.0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out),
                               np.array([2.1, -2.1, 0.0]), rtol=1e-6)

    # second call: derivative on error change
    st2, _ = pid_update_all(g, st, target, jnp.array([0.5, -0.5, 0.0]),
                            no_limit)
    np.testing.assert_allclose(np.asarray(st2.derivative),
                               np.array([-5.0, 5.0, 0.0]), rtol=1e-6)

    # anti-windup (pid.py:36-38): when output-limited, only rows whose
    # error*dt < 0 keep integrating (positive-error row 0 freezes,
    # negative-error row 1 keeps winding down, zero-error row 2 unchanged)
    limited = jnp.ones(3, bool)
    st3, _ = pid_update_all(g, st2, target, meas, limited)
    np.testing.assert_allclose(np.asarray(st3.integrator),
                               np.array([0.15, -0.25, 0.0]), rtol=1e-6)

    # Kimax clamp
    st4 = st
    for _ in range(20):
        st4, _ = pid_update_all(g, st4, target, meas, no_limit)
    assert float(jnp.abs(st4.integrator).max()) <= 0.3 + 1e-6


def _fly(num_steps: int, heading_dem: float, alt_offset: float,
         tas_dem: float):
    """Closed-loop: L1 heading-hold -> TECS -> attitude PIDs -> F-16 dynamics."""
    env = ControlEnv(num_envs=2, config="heading")
    state, _ = env.reset(jax.random.PRNGKey(1))
    ctl = Controller(dt=env.config.dt)
    model = env.model
    mstate = state.model
    _, _, alt0 = model.get_position(mstate)
    hgt_dem = alt0 + alt_offset

    def body(carry, _):
        cst, mstate = carry
        xdot = model.extended_state(mstate)
        data = flight_data(model, mstate, xdot)
        _, _, alt = model.get_position(mstate)
        cst = ctl.update_heading_hold(
            cst, jnp.full((env.n,), heading_dem), data)
        cst = ctl.cal_pitch_throttle(cst, hgt_dem,
                                     jnp.full((env.n,), tas_dem), alt, data)
        cst = ctl.stabilize(cst, data)
        act = jnp.clip(ctl.get_action(cst), -1.0, 1.0)
        mstate = model.update(mstate, act)
        return (cst, mstate), None

    (cst, mstate), _ = jax.lax.scan(body, (ctl.init_state(env.n), mstate),
                                    None, length=num_steps)
    return env, mstate


def test_heading_hold_converges():
    env, mstate = _fly(num_steps=1500, heading_dem=0.5, alt_offset=0.0,
                       tas_dem=1100.0)
    s = np.asarray(mstate.s)
    assert np.isfinite(s).all()
    yaw_err = np.abs(np.asarray(wrap_PI(jnp.asarray(s[:, 5] - 0.5))))
    assert (yaw_err < 0.15).all(), f"yaw error {yaw_err} after 30s"
    # wings roughly level once captured
    assert (np.abs(s[:, 3]) < 0.4).all(), f"roll {s[:, 3]}"


def test_tecs_holds_altitude_and_speed():
    env, mstate = _fly(num_steps=1500, heading_dem=0.0, alt_offset=0.0,
                       tas_dem=1100.0)
    s = np.asarray(mstate.s)
    alt = s[:, 2]
    assert ((alt > 18000) & (alt < 21000)).all(), f"altitude drifted: {alt}"
    vt = s[:, 6]
    assert (np.abs(vt - 1100.0) < 150.0).all(), f"vt {vt}"


def test_controller_reset_masks_rows():
    env = ControlEnv(num_envs=3, config="heading")
    ctl = Controller(dt=env.config.dt)
    cst = ctl.init_state(env.n)
    cst = cst.replace(roll_dem=jnp.ones(env.n), el=jnp.full((env.n,), 5.0))
    mask = jnp.array([True, False, True])
    out = ctl.reset(cst, mask)
    np.testing.assert_allclose(np.asarray(out.roll_dem), [0.0, 1.0, 0.0])
    np.testing.assert_allclose(np.asarray(out.el), [0.0, 5.0, 0.0])


def test_speed_controller_throttle_and_antiwindup():
    """C8 (SpeedController) behavioral contract: PID on longitudinal-accel
    error with the speedcontroller.yaml gains, output saturated to +-100%
    throttle with the integrator anti-windup latched on saturation
    (the reference's intent at `algorithms/pid/speedController.py:10-45`;
    its `rate_pid` bit-rot is fixed here, SURVEY S7 defect list)."""
    from neuralplane_tpu.algorithms.pid import (SpeedControllerConfig,
                                                speed_init,
                                                speed_throttle_out)
    cfg = SpeedControllerConfig()
    st = speed_init(2)

    # Step response: +10 ft/s^2 demand from rest -> positive throttle,
    # proportional path alone contributes Kp*e = 50%.
    st, out = speed_throttle_out(cfg, st, jnp.array([10.0, 0.0]),
                                 jnp.zeros(2))
    assert float(out[0]) > 40.0 and abs(float(out[1])) < 1e-6
    # output is clamped to +-100 even when the raw PID overshoots
    for _ in range(50):
        st, out = speed_throttle_out(cfg, st, jnp.array([10.0, 0.0]),
                                     jnp.zeros(2))
    assert float(out[0]) == 100.0
    assert float(jnp.abs(out).max()) <= 100.0

    # Anti-windup: once saturated (|last_out| >= limit), the integrator of
    # the still-positive-error row must stop winding up.
    i_before = float(st.pid.integrator[0])
    st, _ = speed_throttle_out(cfg, st, jnp.array([10.0, 0.0]), jnp.zeros(2))
    i_after = float(st.pid.integrator[0])
    assert i_after <= i_before + 1e-6
    # zero-error row stays identically zero
    assert abs(float(st.pid.integrator[1])) < 1e-9


def test_yaw_sideslip_damper():
    """C5 legacy servo path (`yawController.py:39-68`): high-pass washed
    yaw-rate damping. With the shipped yaml gains (KA=KI=KD=0) the damper is
    OFF and returns zeros; with KD>0 it opposes the washed yaw rate, the
    high-pass forgets a constant input, and the output clamps to +-45 deg."""
    from neuralplane_tpu.algorithms.pid import (YawDamperConfig,
                                                yaw_damper_init,
                                                yaw_servo_out)
    n = 2
    scaler = jnp.ones(n)
    roll = jnp.zeros(n)
    vt = jnp.full((n,), 1000.0)
    ay = jnp.zeros(n)
    eas2tas = jnp.ones(n)

    # shipped config: all damper gains zero -> output identically zero
    cfg0 = YawDamperConfig()
    st = yaw_damper_init(n)
    st, out = yaw_servo_out(cfg0, st, scaler, roll, vt,
                            jnp.array([0.5, -0.5]), ay, eas2tas)
    np.testing.assert_allclose(np.asarray(out), 0.0)

    # active damper: positive yaw rate -> negative rudder (damping)
    cfg = YawDamperConfig(KA=0.0, KI=0.5, KD=0.1, KFF=1.0)
    st = yaw_damper_init(n)
    rate_z = jnp.array([0.2, -0.2])
    st, out = yaw_servo_out(cfg, st, scaler, roll, vt, rate_z, ay, eas2tas)
    assert float(out[0]) < 0.0 < float(out[1])
    # first-step symmetry
    np.testing.assert_allclose(float(out[0]), -float(out[1]), rtol=1e-6)

    # high-pass washout (KI=0 isolates the rate path): holding the same
    # rate, hp_out decays on the 0.996008 pole, so |servo| shrinks toward 0
    cfg_hp = YawDamperConfig(KA=0.0, KI=0.0, KD=0.1, KFF=1.0)
    st_hp = yaw_damper_init(n)
    mags = []
    for _ in range(200):
        st_hp, out_hp = yaw_servo_out(cfg_hp, st_hp, scaler, roll, vt,
                                      rate_z, ay, eas2tas)
        mags.append(abs(float(out_hp[0])))
    assert mags[-1] < 0.5 * mags[0]

    # clamp: a huge rate step saturates at the +-45 deg servo limit
    st, out = yaw_servo_out(cfg, st, scaler, roll, vt,
                            jnp.array([50.0, -50.0]), ay, eas2tas)
    np.testing.assert_allclose(np.abs(np.asarray(out)), 45.0)

    # turn-coordination offset: in a bank, the expected turn rate
    # g*sin(roll)/vt is subtracted before damping, so a coordinated turn
    # produces (near-)zero rudder
    bank = jnp.full((n,), 0.5)
    turn_rate = 32.174 * jnp.sin(bank) / vt
    st2 = yaw_damper_init(n)
    st2, out2 = yaw_servo_out(cfg, st2, scaler, bank, vt, turn_rate, ay,
                              eas2tas)
    np.testing.assert_allclose(np.asarray(out2), 0.0, atol=1e-5)
