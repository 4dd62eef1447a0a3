/* fastinflate_mod — CPython extension wrapper over fastinflate.c.
 *
 * The ctypes path costs one full output copy (numpy buffer ->
 * PyBytes) plus fresh-allocation page faults on both buffers; at
 * 0.5 GB/s decode that is ~20% of wall.  Here the decoder writes
 * straight into an uninitialized PyBytes and _PyBytes_Resize shrinks
 * it in place (the same structure CPython's zlibmodule uses), so the
 * output is produced exactly once.
 *
 * Exports: inflate_raw(data, bit_pos=0, dictionary=None, size_hint=-1)
 *   -> (bytes, end_bit) on success
 *   -> raises ValueError carrying the fastinflate error code; the
 *      Python caller maps codes to the flate_tpu.errors taxonomy.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include "fastinflate.c"

static PyObject *py_inflate_raw(PyObject *self, PyObject *args) {
    Py_buffer data, dict;
    Py_ssize_t bit_pos = 0;
    Py_ssize_t size_hint = -1;
    dict.buf = NULL;
    dict.len = 0;
    dict.obj = NULL;
    if (!PyArg_ParseTuple(args, "y*|nz*n", &data, &bit_pos, &dict,
                          &size_hint))
        return NULL;
    size_t dict_len = (size_t)dict.len;
    size_t cap;
    if (size_hint >= 0) {
        /* +290: fast-loop copy-overrun headroom (see decode_block) */
        cap = dict_len + (size_t)size_hint + 290;
        if (cap < 4096) cap = 4096;
    } else {
        cap = dict_len + 4 * (size_t)data.len + (1 << 16);
        if (cap < (1 << 16)) cap = 1 << 16;
    }
    PyObject *out = NULL;
    int rc;
    size_t out_len = 0, end_bit = 0;
    for (;;) {
        out = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)cap);
        if (!out) goto fail;
        uint8_t *buf = (uint8_t *)PyBytes_AS_STRING(out);
        if (dict_len)
            memcpy(buf, dict.buf, dict_len);
        out_len = dict_len;
        end_bit = 0;
        Py_BEGIN_ALLOW_THREADS
        rc = inflate_raw((const uint8_t *)data.buf, (size_t)data.len,
                         (size_t)bit_pos, buf, cap, &out_len, &end_bit);
        Py_END_ALLOW_THREADS
        if (rc != ERR_OUT)
            break;
        Py_DECREF(out);
        out = NULL;
        size_t floor = dict_len + 4 * (size_t)data.len + (1 << 16);
        cap = cap * 2 > floor ? cap * 2 : floor;
    }
    if (rc != 0) {
        Py_DECREF(out);
        PyErr_Format(PyExc_ValueError, "fastinflate:%d", rc);
        goto fail;
    }
    if (dict_len) {
        uint8_t *buf = (uint8_t *)PyBytes_AS_STRING(out);
        memmove(buf, buf + dict_len, out_len - dict_len);
    }
    if (_PyBytes_Resize(&out, (Py_ssize_t)(out_len - dict_len)) < 0)
        goto fail;
    PyBuffer_Release(&data);
    if (dict.obj) PyBuffer_Release(&dict);
    return Py_BuildValue("(Nn)", out, (Py_ssize_t)end_bit);
fail:
    PyBuffer_Release(&data);
    if (dict.obj) PyBuffer_Release(&dict);
    return NULL;
}

static PyMethodDef methods[] = {
    {"inflate_raw", py_inflate_raw, METH_VARARGS,
     "inflate_raw(data, bit_pos=0, dictionary=None, size_hint=-1)"
     " -> (bytes, end_bit)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "fastinflate_mod", NULL, -1, methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit_fastinflate_mod(void) {
    return PyModule_Create(&moduledef);
}
