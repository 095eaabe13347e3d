/* Parallel-HDF5 property setters are absent from libhdf5_serial; with
 * the serial 1-rank MPI shim they are semantically no-ops. */
#include "hdf5.h"

herr_t H5Pset_fapl_mpio(hid_t fapl, MPI_Comm comm, MPI_Info info)
{
    (void)fapl; (void)comm; (void)info;
    return 0;
}

herr_t H5Pset_dxpl_mpio(hid_t dxpl, H5FD_mpio_xfer_t mode)
{
    (void)dxpl; (void)mode;
    return 0;
}
